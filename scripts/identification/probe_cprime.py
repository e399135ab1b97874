"""Probe: does the C' = (c11-c12)/2 activation-modulus hypothesis plus
PHYSICAL Kocks-Mecking exponents (a=0.5, b=1) fit the mtsdd goldens?

Round-3's unconstrained 6-parameter fit landed on c1_scale = 0.502862 —
within 1% of C'/mu_VRH = 23.5/47.26 = 0.49725 — suggesting ExaCMech's
thermal-activation exponent uses the elastic model's shear modulus
(cubic C') rather than the props-file "reference shear modulus" (the
VRH average; the reference's own scripts/ecmech_prop_file.py:27-33
computes the file value as the VRH average of C' and c44).

Here we PIN c1_scale to C'/mu, pin (a, b) = (0.5, 1.0), pin s_scale = 1,
and LM-fit only the two Kocks-Mecking constants on the Taylor surrogate.
Compare the residual profile against the round-3 production calibration.

Usage: python scripts/identification/probe_cprime.py [fcc|bcc]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ["EXACONSTIT_MTSDD_CAL"] = "file"

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fit_mtsdd3 import (base_model, beta_sensitivity, golden,  # noqa: E402
                        load_aggregate, make_curve, relax_betas)

DATA = "/root/reference/test/data"
C_PRIME_SCALE = (168.4 - 121.4) / 2.0 / 47.26  # C'/mu_VRH = 0.49725


def run_fit(xtal, theta0, free, label, lm_iters=18):
    quats, w = load_aggregate()
    gold = golden(xtal)
    dts = np.loadtxt(os.path.join(DATA, "custom_dt.txt"))[:len(gold)]
    m0 = base_model(xtal)
    curve = make_curve(m0, quats, w, dts)
    scale = gold.max()
    jac = jax.jit(jax.jacfwd(lambda th, be: curve(th, be)[0]))

    theta = np.asarray(theta0, dtype=float)
    betas = jnp.full(len(gold), 0.45)
    sens = beta_sensitivity(curve, jnp.asarray(theta), betas)
    lam = 1e-2
    t0 = time.time()
    free = np.asarray(free, dtype=bool)
    for it in range(lm_iters):
        thj = jnp.asarray(theta)
        betas = relax_betas(curve, thj, betas, sens, sweeps=3)
        szz = np.asarray(curve(thj, betas)[0])
        r = (szz - gold) / scale
        loss = float(np.sqrt(np.mean(r ** 2)))
        J = np.asarray(jac(thj, betas)) / scale
        J = J[:, free]
        JtJ, g = J.T @ J, J.T @ r
        improved = False
        for _ in range(8):
            dth = np.linalg.solve(JtJ + lam * np.diag(np.diag(JtJ) + 1e-12),
                                  -g)
            th_new = theta.copy()
            th_new[free] += np.clip(dth, -0.7, 0.7)
            b_new = relax_betas(curve, jnp.asarray(th_new), betas, sens,
                                sweeps=2)
            szz_n = np.asarray(curve(jnp.asarray(th_new), b_new)[0])
            l_new = float(np.sqrt(np.mean(((szz_n - gold) / scale) ** 2)))
            if l_new < loss:
                theta, betas, lam = th_new, b_new, max(lam / 3, 1e-7)
                improved = True
                break
            lam *= 10
        print(f"  [{label}] it{it:2d} loss={loss:.4e}"
              f"{' -> ' + format(l_new, '.4e') if improved else ' stall'}"
              f" ({time.time() - t0:.0f}s)", flush=True)
        if not improved:
            break
    thj = jnp.asarray(theta)
    betas = relax_betas(curve, thj, betas, sens, sweeps=4)
    szz = np.asarray(curve(thj, betas)[0])
    rel = (szz - gold) / scale
    print(f"[{label}] theta={theta}  k1={np.exp(theta[0]):.6g} "
          f"k2={np.exp(theta[1]):.6g}")
    print(f"[{label}] Taylor max-rel={np.abs(rel).max():.4e} "
          f"rms={np.sqrt(np.mean(rel**2)):.4e}")
    print("  step: " + " ".join(f"{v:+.4f}" for v in rel))
    return theta, rel


def main():
    xtal = sys.argv[1] if len(sys.argv) > 1 else "fcc"
    # theta = [ln k1, ln k2, a, b, ln s_scale, ln c1_scale]
    lnc = np.log(C_PRIME_SCALE)
    # seeds from the golden-curve extraction (mtsdd_extract_law.py)
    run_fit(xtal, [np.log(109.0), np.log(568.0), 0.5, 1.0, 0.0, lnc],
            free=[1, 1, 0, 0, 0, 0], label=f"{xtal}-cprime-2p")


if __name__ == "__main__":
    main()
