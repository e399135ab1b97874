"""Probe micro-variants of the substep map at step 22 (first dt=0.2).

Replays steps 1-21 with the default law (validated at print floor), then
evaluates step 22 under structural variants of the per-substep update,
printing SIGNED per-component errors vs the golden row.
"""
import dataclasses as dc
import os, sys, tempfile, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax.numpy as jnp
import exaconstit_tpu.models.ecmech as ec
from exaconstit_tpu.config.options import parse_options
from exaconstit_tpu.driver import Simulation, MechSystem

GOLDEN = np.loadtxt("/root/reference/test/data/voce_full_stress.txt")
TOML = "/root/reference/test/data/voce_full.toml"

def main():
    workdir = tempfile.mkdtemp()
    opt = parse_options(TOML)
    sim = Simulation(opt, workdir=workdir)
    sysm = sim.system
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
    np.savez('/tmp/state21.npz', v=np.asarray(sim.v), x=np.asarray(sim.x_beg), state=np.asarray(sim.state))
    print("replay done; state saved", flush=True)

    g = GOLDEN[21]; gscale = np.abs(g).max()
    dt = 0.2
    v21, x21, st21 = sim.v, sim.x_beg, sim.state

    VARIANTS = {
        "base_n2":      dict(),
        "theta0.5":     dict(flow_theta=0.5),
        "stagger2":     dict(stagger_iters=2),
        "h_expon":      None,  # handled via kinetics replace
        "n2_f64":       dict(mixed_precision=False),
    }
    for name, patch in VARIANTS.items():
        model = ec.build_model(opt, sim.props)
        if name == "h_expon":
            kin = dc.replace(model.evptn.kinetics, h_scheme="exponential")
            ev = dc.replace(model.evptn, kinetics=kin)
        else:
            ev = dc.replace(model.evptn, **patch)
        model = dc.replace(model, evptn=ev)
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
