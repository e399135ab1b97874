#!/usr/bin/env python3
"""Run the reference's regression TOML cases and report golden agreement.

The equivalent of the reference's test/test_mechanics.py +
test_mechanics_const_strain_rate.py harnesses, pointed at this framework:
runs each case, compares the appended volume-averaged stress (and where
goldens exist: plastic work, deformation gradient, Dp tensor) against
/root/reference/test/data goldens, and prints a table.

Usage: python scripts/run_reference_suite.py [--cases a.toml b.toml ...]
       [--workdir DIR] [--data DIR]
"""

import argparse
import os
import sys
import time
import traceback

import numpy as np

DEFAULT_CASES = [
    ("voce_full.toml", "voce_full_stress.txt"),
    ("voce_pa.toml", "voce_pa_stress.txt"),
    ("voce_ea.toml", "voce_ea_stress.txt"),
    ("voce_nl_full.toml", "voce_full_stress.txt"),
    ("voce_bcc.toml", "voce_bcc_stress.txt"),
    ("voce_full_cyclic.toml", "voce_full_cyclic_stress.txt"),
    ("voce_full_cyclic_cs.toml", "voce_full_cyclic_cs_stress.txt"),
    ("voce_full_cyclic_csm.toml", "voce_full_cyclic_csm_stress.txt"),
    ("mtsdd_full.toml", "mtsdd_full_stress.txt"),
    ("mtsdd_bcc.toml", "mtsdd_bcc_stress.txt"),
    ("mtsdd_full_auto.toml", "mtsdd_full_auto_stress.txt"),
]

EXTRA_GOLDENS = [("_pl_work.txt", "avg_pl_work_fname"),
                 ("_def_grad.txt", "avg_def_grad_fname"),
                 ("_dp_tensor.txt", "avg_dp_tensor_fname")]


def run_case(data_dir, workdir, toml, golden):
    from exaconstit_tpu.driver import Simulation, parse_options

    d = os.path.join(workdir, toml.split(".")[0])
    os.makedirs(d, exist_ok=True)
    for f in os.listdir(d):
        if f.endswith(".txt"):
            os.remove(os.path.join(d, f))
    t0 = time.time()
    opt = parse_options(os.path.join(data_dir, toml))
    sim = Simulation(opt, workdir=d)
    sim.run(verbose=False)
    got = np.atleast_2d(np.loadtxt(os.path.join(d, opt.avg_stress_fname)))
    ref = np.atleast_2d(np.loadtxt(os.path.join(data_dir, golden)))
    n = min(len(got), len(ref))
    err = np.abs(got[:n] - ref[:n]).max() / np.abs(ref[:n]).max()
    out = {"case": toml, "rows": f"{len(got)}/{len(ref)}",
           "max_rel": err, "time_s": time.time() - t0, "extras": {}}
    base = golden.replace("_stress.txt", "")
    for suffix, attr in EXTRA_GOLDENS:
        gpath = os.path.join(data_dir, base + suffix)
        if os.path.exists(gpath):
            mine = np.atleast_2d(np.loadtxt(os.path.join(
                d, getattr(opt, attr))))
            refx = np.atleast_2d(np.loadtxt(gpath))
            m = min(len(mine), len(refx))
            sc = max(np.abs(refx[:m]).max(), 1e-12)
            out["extras"][suffix] = np.abs(mine[:m] - refx[:m]).max() / sc
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data", default="/root/reference/test/data")
    ap.add_argument("--workdir", default="./suite_out")
    ap.add_argument("--cases", nargs="*", default=None)
    args = ap.parse_args()
    cases = DEFAULT_CASES
    if args.cases:
        cases = [(c, g) for c, g in DEFAULT_CASES if c in args.cases]
    failures = 0
    for toml, golden in cases:
        try:
            r = run_case(args.data, args.workdir, toml, golden)
            extras = " ".join(f"{k}={v:.2e}" for k, v in r["extras"].items())
            print(f"{toml:32s} rows {r['rows']:7s} max-rel "
                  f"{r['max_rel']:.3e} {extras} ({r['time_s']:.0f}s)",
                  flush=True)
        except Exception as e:
            failures += 1
            print(f"{toml:32s} FAILED: {type(e).__name__}: {e}", flush=True)
            traceback.print_exc()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), ".."))
    sys.exit(main())
