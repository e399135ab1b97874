"""Checkpoint / restart.

The reference has no checkpointing (SURVEY.md section 5 flags it as a
gap: mechanics_driver.cpp:625-633 only mentions it as future work).  All
simulation state is explicit here — (x_beg, v, stress, matVars, t, step,
active BC epoch) — so exact resume is a single archive write per interval.
"""

from __future__ import annotations

import os

import numpy as np


def save_checkpoint(path: str, sim, t: float, ti: int):
    import jax
    # active BC epoch: the last update step <= ti (BCManager semantics --
    # cur_bcs stays fixed between update steps)
    bc_epoch = max(s for s in sim.update_steps if s <= ti)
    # archived in the reference's point-major shapes (format stability
    # across layout choices: the device layout is a MechSystem detail)
    sysm = sim.system
    arrays = dict(
        x_beg=sysm.from_node(sim.x_beg),
        v=sysm.from_node(sim.v),
        state=sysm.from_state(sim.state),
        stress=sysm.from_stress(sim.stress),
        t=t,
        ti=ti,
        dt_auto_cur=sim.dt_auto_cur,
        bc_epoch=bc_epoch,
    )
    if hasattr(sim, "state_prev"):
        arrays["state_prev"] = sysm.from_state(sim.state_prev)
    # the from_state/from_node gathers above are collective (all
    # processes participate); only rank 0 writes the archive
    if jax.process_index() != 0:
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **arrays)


def load_checkpoint(path: str, sim):
    data = np.load(path)

    sysm = sim.system
    sim.x_beg = sysm.to_node(data["x_beg"])
    sim.x_cur = sim.x_beg
    sim.v = sysm.to_node(data["v"])
    sim.state = sysm.to_state(data["state"])
    sim.stress = sysm.to_stress(data["stress"])
    if "state_prev" in data:
        sim.state_prev = sysm.to_state(data["state_prev"])
    sim.dt_auto_cur = float(data["dt_auto_cur"])
    # restore the active BC epoch: without this, a restart after a BC
    # change silently resumes with the step-1 BCs until the next update
    # step (the driver only assigns cur_bcs on update steps)
    if "bc_epoch" in data:
        sim.cur_bcs = sim.bc_steps[int(data["bc_epoch"])]
    return float(data["t"]), int(data["ti"])
