"""Full voce_full replay with per-step signed golden errors (profiling
the current integration scheme across the whole ramped-dt schedule)."""
import os, sys, tempfile, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
import numpy as np
from exaconstit_tpu.config.options import parse_options
from exaconstit_tpu.driver import Simulation

GOLDEN = np.loadtxt("/root/reference/test/data/voce_full_stress.txt")
TOML = sys.argv[1] if len(sys.argv) > 1 else \
    "/root/reference/test/data/voce_full.toml"

def main():
    opt = parse_options(TOML)
    sim = Simulation(opt, workdir=tempfile.mkdtemp())
    sysm = sim.system
    t0 = time.time()
    worst = 0.0
    for ti in range(1, sim.nsteps + 1):
        dt = float(sim.cust_dt[ti - 1])
        if ti in sim.update_steps:
            v_prev = sim.v
            sim.cur_bcs = sim.bc_steps[ti]
            sim.update_velocity()
            sim.v = sysm.solve_init(v_prev, sim.v, sim.x_beg, sim.state,
                                    dt, sim.cur_bcs.ess_mask)
        sim.update_velocity()
        v, stress, state_end, conv, nit, _ = sysm.newton_solve(
            sim.v, sim.x_beg, sim.state, dt, sim.cur_bcs.ess_mask,
            verbose=False)
        assert conv
        sim.v = v; sim.x_cur = sim.x_beg + dt*v
        sim.state = state_end; sim.x_beg = sim.x_cur
        if sysm.use_cm:
            el_x = sysm._gather_cm(sim.x_cur)
            stress_q = stress.reshape(6, sysm.fes.nqpts, -1)
        else:
            el_x = sysm._gather(sim.x_cur)
            stress_q = stress
        av = np.asarray(sysm._vol_avg(stress_q, el_x, True))
        g = GOLDEN[ti - 1]; gscale = np.abs(GOLDEN).max()
        err = np.abs(av - g).max() / gscale
        worst = max(worst, err)
        print(f"step {ti:2d} dt={dt:5.3f} err={err:.3e} "
              f"szz_signed={(av[2]-g[2])/gscale:+.3e}", flush=True)
    print(f"max-rel over run: {worst:.3e}  ({time.time()-t0:.0f}s)")

if __name__ == "__main__":
    main()
