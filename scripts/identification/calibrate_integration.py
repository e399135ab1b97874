"""Calibrate evptn integration details against the reference golden curve.

Runs voce_full with EvptnModel field overrides and reports per-step error
of the volume-averaged stress vs the reference golden, to identify which
integration scheme matches ExaCMech's.

Usage:
  python scripts/calibrate_integration.py VARIANT [NSTEPS]
  python scripts/calibrate_integration.py all [NSTEPS]
"""
import dataclasses
import json
import os
import sys
import tempfile

import numpy as np

DATA = "/root/reference/test/data"

# "kin:" prefixed keys override kinetics fields; "opt:" keys override
# ExaOptions attributes; others EvptnModel fields
VARIANTS = {
    "base": {},
    "h_be": {"kin:h_scheme": "backward_euler"},
    "one_minus": {"kin:form": "one_minus"},
    "theta_half": {"flow_theta": 0.5},
    "f64": {"mixed_precision": False},
    "stag2": {"stagger_iters": 2},
    # machinery-isolation variants
    "vmap": {"engine": "vmap"},
    "nomixk": {"opt:mixed_krylov": False},
    "pure": {"mixed_precision": False, "engine": "vmap",
             "opt:mixed_krylov": False},
}


def run_variant(name, overrides, nsteps, case="voce_full.toml",
                golden="voce_full_stress.txt"):
    import exaconstit_tpu.driver as drv
    from exaconstit_tpu.models.ecmech import build_model as bm0

    kin_over = {k[4:]: v for k, v in overrides.items()
                if k.startswith("kin:")}
    opt_over = {k[4:]: v for k, v in overrides.items()
                if k.startswith("opt:")}
    ev_over = {k: v for k, v in overrides.items()
               if not (k.startswith("kin:") or k.startswith("opt:"))}

    def patched(opt, props):
        for k, v in opt_over.items():
            setattr(opt, k, v)
        m = bm0(opt, props)
        ev = m.evptn
        if kin_over:
            ev = dataclasses.replace(
                ev, kinetics=dataclasses.replace(ev.kinetics, **kin_over))
        return dataclasses.replace(m, evptn=dataclasses.replace(
            ev, **ev_over))

    drv.build_model = patched
    with tempfile.TemporaryDirectory() as td:
        opt = drv.parse_options(os.path.join(DATA, case))
        sim = drv.Simulation(opt, workdir=td)
        if not opt.dt_auto:
            sim.nsteps = min(sim.nsteps, nsteps)
        sim.run(verbose=False)
        got = np.atleast_2d(
            np.loadtxt(os.path.join(td, opt.avg_stress_fname)))
    ref = np.atleast_2d(np.loadtxt(os.path.join(DATA, golden)))
    n = min(len(got), len(ref))
    got, ref = got[:n], ref[:n]
    scale = np.abs(ref).max()
    relerr = np.abs(got - ref).max(axis=1) / scale
    # signed error in the dominant (szz) component
    dzz = (got[:, 2] - ref[:, 2]) / scale
    print(f"\n== {name}: overrides={overrides}")
    print("step  relerr      err_szz/scale")
    for i in range(n):
        print(f"{i+1:4d}  {relerr[i]:.3e}  {dzz[i]:+.3e}")
    print(f"max relerr = {relerr.max():.3e}")
    return float(relerr.max())


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "base"
    nsteps = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    results = {}
    names = list(VARIANTS) if which == "all" else [which]
    for name in names:
        try:
            results[name] = run_variant(name, VARIANTS[name], nsteps)
        except Exception as e:
            import traceback
            traceback.print_exc()
            results[name] = f"FAIL {e}"
    print("\n==== calibration summary ====")
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
