"""Diagnostic: run every reference regression case for N steps and report
max relative error of avg stress vs the reference golden file.

Usage: run_tests-style env (CPU, x64).  Writes a summary table to stdout.
"""
import json
import os
import sys
import tempfile
import time
import traceback

import numpy as np

DATA = "/root/reference/test/data"

CASES = [
    ("voce_pa.toml", "voce_pa_stress.txt"),
    ("voce_full.toml", "voce_full_stress.txt"),
    # the reference harness compares voce_nl_full against the linear-Voce
    # golden (test/test_mechanics.py:49-54): its NL props reduce to it
    ("voce_nl_full.toml", "voce_full_stress.txt"),
    ("voce_bcc.toml", "voce_bcc_stress.txt"),
    ("voce_full_cyclic.toml", "voce_full_cyclic_stress.txt"),
    ("mtsdd_bcc.toml", "mtsdd_bcc_stress.txt"),
    ("mtsdd_full.toml", "mtsdd_full_stress.txt"),
    ("mtsdd_full_auto.toml", "mtsdd_full_auto_stress.txt"),
    ("voce_ea.toml", "voce_ea_stress.txt"),
    ("voce_full_cyclic_cs.toml", "voce_full_cyclic_cs_stress.txt"),
    ("voce_full_cyclic_csm.toml", "voce_full_cyclic_csm_stress.txt"),
    ("voce_ea_cs.toml", "voce_ea_cs_stress.txt"),
]


def golden_name(toml_name):
    # reference harness: avg stress golden is <case>_stress.txt
    return toml_name.replace(".toml", "_stress.txt")


def main():
    nsteps = int(os.environ.get("SWEEP_STEPS", "8"))
    only = sys.argv[1:] if len(sys.argv) > 1 else None
    from exaconstit_tpu.driver import Simulation, parse_options

    results = []
    for case, golden in CASES:
        if only and not any(o in case for o in only):
            continue
        gpath = os.path.join(DATA, golden)
        if not os.path.exists(gpath):
            results.append((case, "NO_GOLDEN", None, 0.0))
            print(f"{case:32s} NO_GOLDEN", flush=True)
            continue
        t0 = time.time()
        try:
            with tempfile.TemporaryDirectory() as td:
                opt = parse_options(os.path.join(DATA, case))
                sim = Simulation(opt, workdir=td)
                if not opt.dt_auto:
                    sim.nsteps = min(sim.nsteps, nsteps)
                sim.run(verbose=False)
                got = np.atleast_2d(
                    np.loadtxt(os.path.join(td, opt.avg_stress_fname)))
                ref = np.atleast_2d(np.loadtxt(gpath))
                n = min(len(got), len(ref))
                scale = np.abs(ref[:n]).max()
                err = np.abs(got[:n] - ref[:n]).max() / scale
                # extra outputs (reference runExtra: def_grad/pl_work/dp)
                for tag, fname in (("def_grad", opt.avg_def_grad_fname),
                                   ("pl_work", opt.avg_pl_work_fname),
                                   ("dp_tensor", opt.avg_dp_tensor_fname)):
                    gextra = os.path.join(
                        DATA, case.replace(".toml", f"_{tag}.txt"))
                    fpath = os.path.join(td, fname)
                    if os.path.exists(gextra) and os.path.exists(fpath):
                        g2 = np.loadtxt(fpath)
                        r2 = np.loadtxt(gextra)
                        # 1-col files load as (n,): keep rows as axis 0
                        g2 = g2.reshape(len(g2), -1) if g2.ndim == 1 \
                            else g2
                        r2 = r2.reshape(len(r2), -1) if r2.ndim == 1 \
                            else r2
                        n2 = min(len(g2), len(r2))
                        s2 = max(np.abs(r2[:n2]).max(), 1e-30)
                        e2 = np.abs(g2[:n2] - r2[:n2]).max() / s2
                        print(f"  {tag:10s} relerr={e2:.3e}", flush=True)
                results.append((case, "OK", err, time.time() - t0))
        except Exception as e:
            traceback.print_exc()
            results.append((case, f"FAIL:{type(e).__name__}: {e}"[:90],
                            None, time.time() - t0))
        # print incrementally
        c, st, err, el = results[-1]
        print(f"{c:32s} {st:14s} "
              f"{'' if err is None else f'relerr={err:.3e}'} [{el:.1f}s]",
              flush=True)

    print("\n=== SUMMARY ===")
    for c, st, err, el in results:
        print(f"{c:32s} {st:40s} "
              f"{'' if err is None else f'{err:.3e}'} [{el:.1f}s]")
    with open("/root/repo/.sweep_results.json", "w") as f:
        json.dump([(c, st, err) for c, st, err, _ in results], f, indent=1)


if __name__ == "__main__":
    main()
