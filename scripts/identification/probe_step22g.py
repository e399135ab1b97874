"""Probe round 6 at step 22: SIGNED errors vs substep count and h cadence.

Production (n=2, lagged h) sits at +3.15e-5.  Map the signed error
landscape: n=1/2/3/4, h frozen over substeps (h_per_substep=False), and
the forward-Euler h scheme, to locate which axis can cancel the bias.
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
        print(f"{label:26s} conv={conv} szz_signed={signed[2]:+.3e} "
              f"maxrel={np.abs(signed).max():.3e} ({time.time()-t0:.0f}s)",
              flush=True)

    base = ec.build_model(opt, sim.props)

    def variant(label, **kw):
        run(dc.replace(base, evptn=dc.replace(base.evptn, **kw)), label)

    # substep-count sweep (cap chosen so floor(dt/cap) = n at dt=0.2)
    for n, cap in [(1, 0.21), (2, 0.1), (3, 0.06), (4, 0.05)]:
        variant(f"n={n}", substep_cap=cap)
    variant("n=2,h_frozen", h_per_substep=False)
    variant("n=2,h=FE", h_gd_source="h_forward")
    variant("n=2,gd_begin", h_gd_source="gd_begin")


if __name__ == "__main__":
    main()
