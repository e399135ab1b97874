"""Per-point substep-law identification: n_i = ceil(deff_i*dt/cap).

Greedy golden tracking on voce_full sweeping the per-point deff cap at
each dt >= 0.2 step (dt < 0.2 steps use n=1, validated at print floor).
"""
import json, os, sys, tempfile, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
import numpy as np
import jax.numpy as jnp
from exaconstit_tpu.config.options import parse_options
from exaconstit_tpu.driver import Simulation
from exaconstit_tpu.fem.geometry import grad_calc, jacobians

GOLDEN = np.loadtxt("/root/reference/test/data/voce_full_stress.txt")
TOML = "/root/reference/test/data/voce_full.toml"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/substep_id3.json"
CAPS = [2.5e-4, 5e-4, 7.5e-4, 1.0e-3, 1.5e-3]


def main():
    workdir = tempfile.mkdtemp()
    opt = parse_options(TOML)
    sim = Simulation(opt, workdir=workdir)
    sysm = sim.system

    def avg_stress(stress, x_cur):
        el_x = sysm._gather(x_cur)
        return np.asarray(sysm._vol_avg(stress, el_x, True))

    def perpoint_nsub(v, x_beg, dt, cap):
        el_x = sysm._gather(x_beg + dt * v)
        el_v = sysm._gather(v)
        J = jacobians(el_x, sysm.dshape)
        vgrad = grad_calc(el_v, sysm.dshape, J)
        d = 0.5 * (vgrad + jnp.swapaxes(vgrad, -1, -2))
        d = d - (jnp.trace(d, axis1=-2, axis2=-1) / 3.0)[..., None, None] * jnp.eye(3)
        deff = jnp.sqrt(2.0/3.0 * jnp.sum(d*d, axis=(-2,-1)))
        n = jnp.clip(jnp.ceil(deff * dt / cap), 1, 32).astype(jnp.int32)
        return n.reshape(-1)

    orig = sysm._compute_nsub
    records = []
    for ti in range(1, sim.nsteps + 1):
        dt = float(sim.cust_dt[ti - 1])
        g = GOLDEN[ti - 1]; gscale = np.abs(g).max()
        if ti in sim.update_steps:
            v_prev = sim.v
            sim.cur_bcs = sim.bc_steps[ti]
            sim.update_velocity()
            sim.v = sysm.solve_init(v_prev, sim.v, sim.x_beg, sim.state, dt, sim.cur_bcs.ess_mask)
        sim.update_velocity()
        if dt < 0.2 - 1e-12:
            sysm._compute_nsub = orig
            v, stress, state_end, conv, nit, _ = sysm.newton_solve(sim.v, sim.x_beg, sim.state, dt, sim.cur_bcs.ess_mask, verbose=False)
            assert conv
            av = avg_stress(stress, sim.x_beg + dt*v)
            err = float(np.abs(av - g).max() / gscale)
            rec = dict(step=ti, dt=dt, mode="default", err=err)
            print(f"step {ti:2d} dt={dt:5.3f} default  err={err:.3e}", flush=True)
        else:
            v_entry = sim.v
            best = None; errs = {}
            for cap in CAPS:
                sysm._compute_nsub = lambda v, x, d, _c=cap: perpoint_nsub(v, x, d, _c)
                t0 = time.time()
                v, stress, state_end, conv, nit, _ = sysm.newton_solve(v_entry, sim.x_beg, sim.state, dt, sim.cur_bcs.ess_mask, verbose=False)
                if not conv:
                    errs[str(cap)] = float('nan'); continue
                av = avg_stress(stress, sim.x_beg + dt*v)
                err = float(np.abs(av - g).max() / gscale)
                errs[str(cap)] = err
                if best is None or err < best[0]:
                    best = (err, cap, v, stress, state_end)
                print(f"  step {ti:2d} dt={dt:5.3f} cap={cap:.1e} err={err:.3e} ({time.time()-t0:.1f}s, {nit} NR)", flush=True)
            err, cbest, v, stress, state_end = best
            rec = dict(step=ti, dt=dt, mode="sweep", errs=errs, best_cap=cbest, err=err)
            print(f"step {ti:2d} dt={dt:5.3f} BEST cap={cbest:.1e} err={err:.3e}", flush=True)
        records.append(rec)
        json.dump(records, open(OUT, "w"), indent=1)
        sim.v = v; sim.x_cur = sim.x_beg + dt*v
        sim.state_prev = sim.state; sim.stress = stress
        sim.state = state_end; sim.x_beg = sim.x_cur
    print("done ->", OUT)


if __name__ == "__main__":
    main()
