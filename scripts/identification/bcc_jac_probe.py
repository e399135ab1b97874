"""Probe the BCC SplineG LM stall: is the jacfwd Jacobian finite?

The FCC fem space-mapping converged (FEM max-rel 2.1e-3) while the BCC
run hard-stalled at LM it-0 in every round despite an S-shaped,
family-fixable error profile.  A hard stall with an exact forward-mode
Jacobian is the signature of NaN/Inf entries (np.linalg.solve then
yields a NaN step and no damping level can accept it).  This probe
evaluates curve(theta0) and jacfwd at theta0 for both crystals and
reports non-finite counts per parameter column.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ["EXACONSTIT_MTSDD_CAL"] = "file"
os.environ["EXACONSTIT_IFT_TANGENTS"] = "1"

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fit_mtsdd3 import base_model, golden, load_aggregate  # noqa: E402
from fit_mtsdd_np import (estimate_sens, init_theta,  # noqa: E402
                          make_curve_np)

DATA = "/root/reference/test/data"


def main():
    xtal = sys.argv[1] if len(sys.argv) > 1 else "bcc"
    quats, w = load_aggregate()
    gold = golden(xtal)
    dts = np.loadtxt(os.path.join(DATA, "custom_dt.txt"))[:len(gold)]
    m0 = base_model(xtal)
    kin0 = m0.evptn.kinetics
    g0 = kin0.go + kin0.s * np.sqrt(kin0.rho_dd_init)
    M = 3.06 if xtal == "fcc" else 2.75
    g_max = 1.15 * (gold.max() / M - kin0.tau_a)
    knots = np.linspace(g0 * 0.999, g_max, 12)
    theta = init_theta(xtal, knots, True, gold, dts)
    print(f"theta0={np.array2string(theta, precision=4)}")

    t0 = time.time()
    sens = estimate_sens(m0, quats, w, dts, knots, True, theta)
    curve = make_curve_np(m0, quats, w, dts, knots, True, sens)
    szz, lat = curve(jnp.asarray(theta))
    szz = np.asarray(szz)
    print(f"curve: nonfinite={np.sum(~np.isfinite(szz))}/{szz.size} "
          f"({time.time()-t0:.0f}s)")

    jac = jax.jit(jax.jacfwd(lambda th: curve(th)[0]))
    J = np.asarray(jac(jnp.asarray(theta)))
    print(f"jac shape {J.shape} ({time.time()-t0:.0f}s)")
    bad = ~np.isfinite(J)
    print(f"jac: nonfinite={bad.sum()}/{J.size}")
    if bad.sum():
        print("nonfinite per column:", bad.sum(axis=0))
        print("nonfinite per row(step):", bad.sum(axis=1))
    # column norms show dead coordinates even when finite
    print("col |J|:", np.array2string(np.abs(J).max(axis=0),
                                      precision=3))


if __name__ == "__main__":
    main()
