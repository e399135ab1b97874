"""Measure the XLA-vs-Pallas crossover batch for the f32 dogleg stage.

Round-4 verdict item 6: the default-on kernel was 0.90x at 33k points
and 6.9x at 884k — this sweeps the isolated stage A/B over batch sizes
to locate the crossover that ``ecmech.PALLAS_MIN_BATCH`` encodes (the
production dispatch runs XLA below it, the kernel above it).

Usage: python pallas_crossover.py [N1 N2 ...]   (default sweep)
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pallas_stage_bench import run_ab  # noqa: E402


def main():
    ns = [int(a) for a in sys.argv[1:]] or [
        16384, 32768, 65536, 131072, 262144, 524288]
    rows = []
    for n in ns:
        r = run_ab(N=n, dt=0.05, reps=3)
        rows.append({"n": n, "t_xla_ms": r["t_xla"] * 1e3,
                     "t_pallas_ms": r["t_pallas"] * 1e3,
                     "speedup": r["speedup"]})
        print(json.dumps(rows[-1]), flush=True)
    print("\nsummary:")
    for r in rows:
        print(f"  N={r['n']:8d}  xla {r['t_xla_ms']:8.2f} ms  "
              f"pallas {r['t_pallas_ms']:8.2f} ms  "
              f"speedup {r['speedup']:.3f}x")
    cross = next((r["n"] for r in rows if r["speedup"] >= 1.0), None)
    print(f"crossover (first N with speedup >= 1): {cross}")


if __name__ == "__main__":
    main()
