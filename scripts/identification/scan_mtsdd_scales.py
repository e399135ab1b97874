"""2-parameter scan: is the MTSDD mismatch a pure constant rescale?

Hypothesis test for the "hidden density normalization" theory: if
ExaCMech's KMBalD update is the documented law with internally rescaled
constants, then drho/dGamma = alpha*k1*sqrt(rho) - beta*k2(gdot)*rho
(classic exponents, NO flow-strength shape factors) must reproduce the
golden curve.  Scan (ln alpha, ln beta) on the lateral-relaxed Taylor
surrogate and report the best achievable max-rel error; if the floor of
this 2-D family is >> the 6-param fit's, the family (not the constants)
is what's wrong.

Usage: python scan_mtsdd_scales.py [fcc|bcc] [coarse_n]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ["EXACONSTIT_MTSDD_CAL"] = "file"
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_enable_x64", True)

from fit_mtsdd3 import (base_model, beta_sensitivity, golden,  # noqa: E402
                        load_aggregate, make_curve, relax_betas)

DATA = "/root/reference/test/data"


def main():
    xtal = sys.argv[1] if len(sys.argv) > 1 else "fcc"
    ncoarse = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    nsteps = int(os.environ.get("SCAN_STEPS", "29"))

    quats, w = load_aggregate()
    gold = golden(xtal)[:nsteps]
    dts = np.loadtxt(os.path.join(DATA, "custom_dt.txt"))[:nsteps]
    m0 = base_model(xtal)
    curve = make_curve(m0, quats, w, dts)
    scale = gold.max()

    k1f = float(np.atleast_1d(m0.evptn.kinetics.k1)[0])
    k2f = float(np.atleast_1d(m0.evptn.kinetics.k2_0)[0])

    betas = jnp.full(len(gold), 0.45)
    th0 = jnp.asarray([np.log(k1f), np.log(k2f), 0.5, 1.0, 0.0, 0.0])
    sens = beta_sensitivity(curve, th0, betas)

    def err_at(lna, lnb, betas):
        th = jnp.asarray([np.log(k1f) + lna, np.log(k2f) + lnb,
                          0.5, 1.0, 0.0, 0.0])
        betas = relax_betas(curve, th, betas, sens, sweeps=3)
        szz = np.asarray(curve(th, betas)[0])
        return float(np.max(np.abs(szz - gold)) / scale), betas

    # coarse grid in the normalization-candidate range: alpha, beta in
    # [1, 1/rho_init^2] ~ [1, 1.2e6]
    lnas = np.linspace(0.0, 14.0, ncoarse)
    lnbs = np.linspace(0.0, 14.0, ncoarse)
    best = (np.inf, 0.0, 0.0)
    for lna in lnas:
        for lnb in lnbs:
            e, betas = err_at(lna, lnb, betas)
            print(f"lna={lna:6.2f} lnb={lnb:6.2f}  maxrel={e:.4e}",
                  flush=True)
            if e < best[0]:
                best = (e, lna, lnb)
    print(f"coarse best: maxrel={best[0]:.4e} at lna={best[1]:.2f} "
          f"lnb={best[2]:.2f}", flush=True)

    # local refinement (2 rounds of shrinking 5x5 grids)
    e0, lna0, lnb0 = best
    width = (lnas[1] - lnas[0])
    for _ in range(3):
        for lna in np.linspace(lna0 - width, lna0 + width, 5):
            for lnb in np.linspace(lnb0 - width, lnb0 + width, 5):
                e, betas = err_at(lna, lnb, betas)
                if e < best[0]:
                    best = (e, lna, lnb)
        e0, lna0, lnb0 = best
        width /= 2.0
        print(f"refined best: maxrel={best[0]:.4e} at lna={lna0:.3f} "
              f"lnb={lnb0:.3f}", flush=True)

    a, b = np.exp(best[1]), np.exp(best[2])
    print(f"FINAL {xtal}: maxrel={best[0]:.4e}  alpha={a:.6g} "
          f"beta={b:.6g}  k1_eff={k1f * a:.6g} k2_eff={k2f * b:.6g}")
    rho0 = float(np.atleast_1d(m0.evptn.kinetics.rho_dd_init)[0])
    for name, v in (("1/rho0", 1 / rho0), ("1/rho0^1.5", rho0 ** -1.5),
                    ("1/rho0^2", rho0 ** -2), ("1/sqrt(rho0)",
                                               rho0 ** -0.5)):
        print(f"  candidate {name} = {v:.6g}")


if __name__ == "__main__":
    main()
