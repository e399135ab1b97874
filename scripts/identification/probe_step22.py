"""Probe micro-variants of the substep scheme at step 22 (first dt=0.2).

Replays steps 1-21 with the default law (validated at print floor), then
evaluates step 22 under structural variants of the per-substep update,
printing SIGNED per-component errors vs the golden row.

Saves/loads the replayed state at /tmp/state21.npz so variant sweeps are
cheap to iterate.
"""
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
    sysm = sim.system
    if os.path.exists(STATE):
        z = np.load(STATE)
        sim.v = jnp.asarray(z["v"]); sim.x_beg = jnp.asarray(z["x"])
        sim.state = jnp.asarray(z["state"])
        sim.cur_bcs = sim.bc_steps[1]
        print("state21 loaded", flush=True)
    else:
        for ti in range(1, 22):
            dt = float(sim.cust_dt[ti - 1])
            if ti in sim.update_steps:
                v_prev = sim.v
                sim.cur_bcs = sim.bc_steps[ti]
                sim.update_velocity()
                sim.v = sysm.solve_init(v_prev, sim.v, sim.x_beg, sim.state, dt, sim.cur_bcs.ess_mask)
            sim.update_velocity()
            v, stress, state_end, conv, nit, _ = sysm.newton_solve(sim.v, sim.x_beg, sim.state, dt, sim.cur_bcs.ess_mask, verbose=False)
            assert conv
            sim.v = v; sim.x_cur = sim.x_beg + dt*v
            sim.state = state_end; sim.x_beg = sim.x_cur
        np.savez(STATE, v=np.asarray(sim.v), x=np.asarray(sim.x_beg), state=np.asarray(sim.state))
        print("replay done; state saved", flush=True)

    g = GOLDEN[21]; gscale = np.abs(g).max()
    dt = 0.2
    v21, x21, st21 = sim.v, sim.x_beg, sim.state

    def kin_patch(model, **kw):
        kin = dc.replace(model.evptn.kinetics, **kw)
        return dc.replace(model, evptn=dc.replace(model.evptn, kinetics=kin))

    VARIANTS = {
        "base_n2":      lambda m: m,
        "f64_n2":       lambda m: dc.replace(m, evptn=dc.replace(m.evptn, mixed_precision=False)),
        "h_expon":      lambda m: kin_patch(m, h_scheme="exponential"),
        "stagger2":     lambda m: dc.replace(m, evptn=dc.replace(m.evptn, stagger_iters=2)),
        "stagger4":     lambda m: dc.replace(m, evptn=dc.replace(m.evptn, stagger_iters=4)),
        "theta0.5":     lambda m: dc.replace(m, evptn=dc.replace(m.evptn, flow_theta=0.5)),
        "h_full_dt":    lambda m: dc.replace(m, evptn=dc.replace(m.evptn, h_per_substep=False)),
        "exp_stag2":    lambda m: kin_patch(dc.replace(m, evptn=dc.replace(m.evptn, stagger_iters=2)), h_scheme="exponential"),
    }
    only = set(sys.argv[1:])
    for name, patch in VARIANTS.items():
        if only and name not in only:
            continue
        model = patch(ec.build_model(opt, sim.props))
        system = MechSystem(opt, sim.mesh, model)
        t0 = time.time()
        v, stress, state_end, conv, nit, _ = system.newton_solve(v21, x21, st21, dt, sim.cur_bcs.ess_mask, verbose=False)
        el_x = system._gather(x21 + dt*v)
        av = np.asarray(system._vol_avg(stress, el_x, True))
        signed = (av - g)/gscale
        print(f"{name:10s} conv={conv} maxrel={np.abs(signed).max():.3e} "
              f"signed=[" + " ".join(f"{s:+.2e}" for s in signed) + f"] ({time.time()-t0:.0f}s)", flush=True)

if __name__ == "__main__":
    main()
