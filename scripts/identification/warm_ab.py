"""A/B the material-solve warm start on a small FEM problem.

Runs identical adaptive Newton time steps with the warm start enabled
vs disabled (same system, same inputs) and reports per-step wall time
and the summed per-point dogleg iteration counts (state's NFEVAL
column) — the iteration count is contention-independent, so it is the
honest algorithmic metric on a loaded box.

Usage: python scripts/warm_ab.py [nsteps] [ncut]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def run(system, v0, x0, state0, ess_flat, dts, warm):
    import jax
    system.warm_start = warm
    ess = np.asarray(ess_flat).reshape(-1, 3)
    v, x, st = v0, x0, state0
    iters_total = 0.0
    newton_its = []
    times = []
    for dt in dts:
        t0 = time.perf_counter()
        v, stress, st2, conv, nit, _ = system.newton_solve(
            v, x, st, dt, ess, verbose=False)
        jax.block_until_ready(stress)
        times.append(time.perf_counter() - t0)
        # NFEVAL column: dogleg iterations spent this step, per point
        iters_total += float(np.asarray(st2[:, :, 3]).sum())
        newton_its.append(nit)
        x = x + dt * v
        st = st2
    return times, iters_total, newton_its


def main():
    nsteps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    ncut = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    from __graft_entry__ import _tiny_problem

    dts = [0.005, 0.02] + [0.05] * nsteps
    results = {}
    for warm in (False, True):
        system, v0, x0, state, ess_flat = _tiny_problem([ncut] * 3)
        results[warm] = run(system, v0, x0, state, ess_flat, dts, warm)
        t, it, nits = results[warm]
        print(f"warm={warm}: wall/step {np.mean(t[2:]):.3f}s "
              f"(steps: {['%.2f' % x for x in t]}), dogleg iters "
              f"{it:.3e}, newton its {nits}", flush=True)
    t0, i0, _ = results[False]
    t1, i1, _ = results[True]
    print(f"dogleg-iter ratio warm/cold: {i1 / i0:.3f}")
    print(f"steady wall ratio warm/cold: "
          f"{np.mean(t1[2:]) / np.mean(t0[2:]):.3f}")


if __name__ == "__main__":
    main()
