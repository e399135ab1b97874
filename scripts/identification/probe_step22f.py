"""Probe round 5 at step 22: kinematic / ordering scheme variants.

The residual per-substep bias at dt >= 0.2 (~1.2e-5/step with n=2) is
not the h integrator (probe_step22e: BE/exact/FE all within 0.5e-5).
Remaining one-pass scheme choices inside a substep:

  rot=begin   — rotate (d, w) to the lattice frame with the
                begin-of-substep orientation (explicit) instead of the
                implicit end-of-substep one
  h=before    — advance h from begin-of-substep slip rates BEFORE the
                (e, xi) solve (one-way predictor ordering)
  theta=0.5   — trapezoidal plastic-flow term
  stagger=2   — a second (solve | h-update) pass per substep
  n=1/n=3     — neighbor substep counts (context)

Run from state21 (/tmp/state21.npz, golden-matched at ~5e-6) over the
single dt=0.2 step 22; print signed per-component golden errors.
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

    def run(model, label, nsub=None):
        system = MechSystem(opt, sim.mesh, model)
        if nsub is not None:
            system.fixed_nsub = nsub
        t0 = time.time()
        v, stress, state_end, conv, nit, _ = system.newton_solve(
            v21, x21, st21, dt, sim.cur_bcs.ess_mask, verbose=False)
        el_x = system._gather(x21 + dt * v)
        av = np.asarray(system._vol_avg(stress, el_x, True))
        signed = (av - g) / gscale
        print(f"{label:26s} conv={conv} maxrel={np.abs(signed).max():.3e} "
              f"signed=[" + " ".join(f"{s:+.2e}" for s in signed) +
              f"] ({time.time() - t0:.0f}s)", flush=True)

    base = ec.build_model(opt, sim.props)

    def variant(label, **kw):
        run(dc.replace(base, evptn=dc.replace(base.evptn, **kw)), label)

    run(base, "production(cm,n=2)")
    variant("vmap-baseline", engine="vmap")
    variant("rot=begin", rot_frame="begin")
    variant("h=before", h_order="before")
    variant("h=before,rot=begin", h_order="before", rot_frame="begin")
    variant("theta=0.5", flow_theta=0.5)
    variant("stagger=2", stagger_iters=2)


if __name__ == "__main__":
    main()
