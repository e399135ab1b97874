"""Run an MTSDD FEM case step-by-step, printing per-step golden error.

Usage: python scripts/mtsdd_fem_curve.py [fcc|bcc|auto] [workdir]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

DATA = "/root/reference/test/data"


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "fcc"
    work = sys.argv[2] if len(sys.argv) > 2 else "."
    max_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 10 ** 9
    case, gold = {
        "fcc": ("mtsdd_full.toml", "mtsdd_full_stress.txt"),
        "bcc": ("mtsdd_bcc.toml", "mtsdd_bcc_stress.txt"),
        "auto": ("mtsdd_full_auto.toml", "mtsdd_full_auto_stress.txt"),
    }[which]

    from exaconstit_tpu.driver import Simulation, parse_options

    opt = parse_options(os.path.join(DATA, case))
    sim = Simulation(opt, workdir=work)
    ref = np.loadtxt(os.path.join(DATA, gold))
    scale = np.abs(ref).max()

    t0 = time.time()
    worst = 0.0
    t, ti = 0.0, 1
    while (ti <= min(sim.nsteps, max_steps)
           or (opt.dt_auto and t < sim.t_final - 1e-14 and
               ti <= max_steps)):
        if sim.cust_dt is not None:
            dt = float(sim.cust_dt[ti - 1])
        elif opt.dt_auto:
            dt = min(sim.dt_auto_cur, sim.t_final - t)
        else:
            dt = min(opt.dt, sim.t_final - t)
        try:
            dt_used = sim.advance(ti, dt, verbose=False)
        except RuntimeError as e:
            print(f"step {ti}: DIVERGED ({e})", flush=True)
            break
        t += dt_used
        sim.write_averages()
        got = np.atleast_2d(np.loadtxt(os.path.join(work,
                                                    opt.avg_stress_fname)))
        k = len(got) - 1
        if k < len(ref):
            err = np.abs(got[k] - ref[k]).max() / scale
            worst = max(worst, err)
            print(f"step {ti:3d} dt={dt_used:6.3f} szz={got[k, 2]:+.5e} "
                  f"ref={ref[k, 2]:+.5e} err={err:.3e} "
                  f"({time.time() - t0:.0f}s)", flush=True)
        if abs(t - sim.t_final) <= abs(1e-3 * dt_used):
            break
        ti += 1
    print(f"MAX REL {worst:.4e}  wall {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
