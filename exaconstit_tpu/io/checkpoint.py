"""Checkpoint / restart.

The reference has no checkpointing (SURVEY.md section 5 flags it as a
gap: mechanics_driver.cpp:625-633 only mentions it as future work).  All
simulation state is explicit here — (x_beg, v, stress, matVars, t, step)
— so exact resume is a single archive write per interval.
"""

from __future__ import annotations

import os

import numpy as np


def save_checkpoint(path: str, sim, t: float, ti: int):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(
        path,
        x_beg=np.asarray(sim.x_beg),
        v=np.asarray(sim.v),
        state=np.asarray(sim.state),
        stress=np.asarray(sim.stress),
        t=t,
        ti=ti,
        dt_auto_cur=sim.dt_auto_cur,
    )


def load_checkpoint(path: str, sim):
    import jax.numpy as jnp

    data = np.load(path)
    sim.x_beg = jnp.asarray(data["x_beg"])
    sim.x_cur = sim.x_beg
    sim.v = jnp.asarray(data["v"])
    sim.state = jnp.asarray(data["state"])
    sim.stress = jnp.asarray(data["stress"])
    sim.dt_auto_cur = float(data["dt_auto_cur"])
    return float(data["t"]), int(data["ti"])
