"""Probe round 4 at step 22: hardness-integration scheme variants.

The full-40-step voce_full drift (+5.2e-4 by step 40) is a systematic
positive per-substep bias (~3e-5/step at dt>=0.2).  The h update is the
only remaining O(dgam^2) scheme choice: test backward-Euler (production)
vs the exact frozen-gs exponential vs forward Euler, with both gdot
sources, against the step-22 golden (state from /tmp/state21.npz).
"""
import dataclasses as dc
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
import numpy as np

GOLDEN = np.loadtxt("/root/reference/test/data/voce_full_stress.txt")
TOML = "/root/reference/test/data/voce_full.toml"
STATE = "/tmp/state21.npz"


def main():
    import jax.numpy as jnp
    import exaconstit_tpu.models.ecmech as ec
    from exaconstit_tpu.config.options import parse_options
    from exaconstit_tpu.driver import Simulation, MechSystem

    workdir = tempfile.mkdtemp()
    opt = parse_options(TOML)
    sim = Simulation(opt, workdir=workdir)
    z = np.load(STATE)
    v21 = jnp.asarray(z["v"])
    x21 = jnp.asarray(z["x"])
    st21 = jnp.asarray(z["state"])
    sim.cur_bcs = sim.bc_steps[1]
    g = GOLDEN[21]
    gscale = np.abs(g).max()
    dt = 0.2

    def run(model, label):
        system = MechSystem(opt, sim.mesh, model)
        t0 = time.time()
        v, stress, state_end, conv, nit, _ = system.newton_solve(
            v21, x21, st21, dt, sim.cur_bcs.ess_mask, verbose=False)
        el_x = system._gather(x21 + dt * v)
        av = np.asarray(system._vol_avg(stress, el_x, True))
        signed = (av - g) / gscale
        print(f"{label:22s} conv={conv} maxrel={np.abs(signed).max():.3e} "
              f"signed=[" + " ".join(f"{s:+.2e}" for s in signed) +
              f"] ({time.time() - t0:.0f}s)", flush=True)

    base = ec.build_model(opt, sim.props)

    for scheme in ("backward_euler", "exact"):
        for src in ("converged", "h_forward"):
            if scheme == "exact" and src == "h_forward":
                continue
            kin = dc.replace(base.evptn.kinetics, h_scheme=scheme)
            m = dc.replace(base, evptn=dc.replace(
                base.evptn, kinetics=kin, h_gd_source=src))
            run(m, f"{scheme}/{src}")

    # gd_begin + exact: explicit in gdots, exact in h
    kin = dc.replace(base.evptn.kinetics, h_scheme="exact")
    m = dc.replace(base, evptn=dc.replace(
        base.evptn, kinetics=kin, h_gd_source="gd_begin"))
    run(m, "exact/gd_begin")


if __name__ == "__main__":
    main()
