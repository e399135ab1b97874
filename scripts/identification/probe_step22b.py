"""Probe round 2 at step 22: signed n-sweep + vmap-engine theta variants."""
import dataclasses as dc
import os, sys, tempfile, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
import numpy as np
import jax.numpy as jnp
import exaconstit_tpu.models.ecmech as ec
from exaconstit_tpu.config.options import parse_options
from exaconstit_tpu.driver import Simulation, MechSystem

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

    g = GOLDEN[21]; gscale = np.abs(g).max()
    dt = 0.2

    def run(system, label, nsub=None):
        if nsub is not None:
            system._compute_nsub = lambda v, x, d, _n=nsub: jnp.full(
                (system.ne_pad * system.fes.nqpts,), _n, jnp.int32)
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
    sys_base = MechSystem(opt, sim.mesh, base)
    for n in (1, 2, 3, 4, 8, 16):
        run(sys_base, f"cm_n{n}", nsub=n)

    vm = dc.replace(base, evptn=dc.replace(base.evptn, engine="vmap"))
    run(MechSystem(opt, sim.mesh, vm), "vmap_n2")
    th = dc.replace(base, evptn=dc.replace(base.evptn, engine="vmap",
                                           flow_theta=0.5))
    sys_th = MechSystem(opt, sim.mesh, th)
    run(sys_th, "vmap_th.5_n2")
    run(sys_th, "vmap_th.5_n1", nsub=1)

if __name__ == "__main__":
    main()
