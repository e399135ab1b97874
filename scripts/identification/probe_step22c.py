"""Probe round 3 at step 22: (a) pointwise composition sanity check
(one dt=0.2/nsub=2 call vs two dt=0.1 calls on the same points);
(b) h-update gdot-source variants in the FEM solve."""
import dataclasses as dc
import os, sys, tempfile, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp
import exaconstit_tpu.models.ecmech as ec
from exaconstit_tpu.config.options import parse_options
from exaconstit_tpu.driver import Simulation, MechSystem
from exaconstit_tpu.fem.geometry import grad_calc, jacobians

GOLDEN = np.loadtxt("/root/reference/test/data/voce_full_stress.txt")
TOML = "/root/reference/test/data/voce_full.toml"
STATE = "/tmp/state21.npz"


def main():
    workdir = tempfile.mkdtemp()
    opt = parse_options(TOML)
    sim = Simulation(opt, workdir=workdir)
    z = np.load(STATE)
    v21 = jnp.asarray(z["v"]); x21 = jnp.asarray(z["x"])
    st21 = jnp.asarray(z["state"])
    sim.cur_bcs = sim.bc_steps[1]
    sysm = sim.system
    g = GOLDEN[21]; gscale = np.abs(g).max()
    dt = 0.2

    # ---- (a) pointwise composition check --------------------------------
    model = ec.build_model(opt, sim.props)
    # converged base solve to get the velocity field
    v, stress, state_end, conv, nit, _ = sysm.newton_solve(
        v21, x21, st21, dt, sim.cur_bcs.ess_mask, verbose=False)
    el_x = sysm._gather(x21 + dt * v)
    el_v = sysm._gather(v)
    J = jacobians(el_x, sysm.dshape)
    vgrad = np.asarray(grad_calc(el_v, sysm.dshape, J)).reshape(-1, 3, 3)
    vgrad = jnp.asarray(vgrad)
    st_flat = st21.reshape(vgrad.shape[0], -1)

    s_a, se_a, _ = model.model_setup(dt, vgrad, st_flat,
                                     compute_tangent=False,
                                     nsub=jnp.full((vgrad.shape[0],), 2,
                                                   jnp.int32))
    s_m, se_m, _ = model.model_setup(0.5 * dt, vgrad, st_flat,
                                     compute_tangent=False,
                                     nsub=jnp.ones((vgrad.shape[0],),
                                                   jnp.int32))
    s_b, se_b, _ = model.model_setup(0.5 * dt, vgrad, se_m,
                                     compute_tangent=False,
                                     nsub=jnp.ones((vgrad.shape[0],),
                                                   jnp.int32))
    print("composition: max|stress diff| =",
          float(jnp.max(jnp.abs(s_a - s_b))),
          " max|state diff| =", float(jnp.max(jnp.abs(se_a - se_b))),
          flush=True)

    # ---- (b) FEM variants ----------------------------------------------
    def run(model, label):
        system = MechSystem(opt, sim.mesh, model)
        t0 = time.time()
        v, stress, state_end, conv, nit, _ = system.newton_solve(
            v21, x21, st21, dt, sim.cur_bcs.ess_mask, verbose=False)
        el_x = system._gather(x21 + dt*v)
        av = np.asarray(system._vol_avg(stress, el_x, True))
        signed = (av - g)/gscale
        print(f"{label:14s} conv={conv} maxrel={np.abs(signed).max():.3e} "
              f"signed=[" + " ".join(f"{s:+.2e}" for s in signed) +
              f"] ({time.time()-t0:.0f}s)", flush=True)

    base = ec.build_model(opt, sim.props)
    for mode in ("gd_begin", "h_forward"):
        m = dc.replace(base, evptn=dc.replace(base.evptn, engine="vmap",
                                              h_gd_source=mode))
        run(m, mode)

if __name__ == "__main__":
    main()
