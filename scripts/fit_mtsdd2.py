"""Stage-2 identification of the effective KMBalD density-evolution law.

Builds on scripts/fit_mtsdd.py (2-param Estrin-Mecking fit, ~1% rms) and
scripts/identify_mtsdd2.py (nonparametric drho/dGamma extraction, which
shows the law is near-affine in rho with a slight upward curvature that
no 2-parameter family captures).  Here the family is widened to

    drho/dGamma = k1 rho^a - k2(gdot) rho^b,
    k2 = k2_0 (gam_ro_dd / gdot)^ninv

with free (log k1, log k2_0, a, b), fitted by Nelder-Mead against the
full 40-step golden through the REAL integrator (staggered substepped
solve), so discretization effects are part of the forward model.

Usage:
  python scripts/fit_mtsdd2.py fit [fcc|bcc] [k1 k2 a b]
  python scripts/fit_mtsdd2.py curve k1 k2 a b [fcc|bcc]
"""
import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

DATA = "/root/reference/test/data"


def load_aggregate():
    quats = np.loadtxt(os.path.join(DATA, "voce_quats.ori")).reshape(-1, 4)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    grains = np.loadtxt(os.path.join(DATA, "grains.txt")).astype(int)
    g = grains[:, -1] if grains.ndim == 2 else grains
    counts = np.bincount(g - 1, minlength=quats.shape[0]).astype(float)
    w = counts / counts.sum()
    keep = w > 0
    return quats[keep], w[keep]


def build(xtal, k1, k2, a, b):
    from exaconstit_tpu.config.options import parse_options
    from exaconstit_tpu.models.ecmech import build_model

    case = "mtsdd_full.toml" if xtal == "fcc" else "mtsdd_bcc.toml"
    opt = parse_options(os.path.join(DATA, case))
    props = np.loadtxt(os.path.join(DATA, "props_cp_mts.txt"))
    m = build_model(opt, props)
    kin = dataclasses.replace(m.evptn.kinetics, k1=float(k1),
                              k2_0=float(k2), prod_exponent=float(a),
                              recov_exponent=float(b))
    ev = dataclasses.replace(m.evptn, kinetics=kin)
    return dataclasses.replace(m, evptn=ev)


def taylor_curve(model, quats, w, nsteps=40):
    """Relaxed Taylor aggregate through the golden dt schedule."""
    dts = np.loadtxt(os.path.join(DATA, "custom_dt.txt"))[:nsteps]
    rate = 1.0e-3
    n = quats.shape[0]
    state = jnp.asarray(model.init_state(quats))
    wj = jnp.asarray(w)

    @jax.jit
    def step(state, dt, beta):
        L = jnp.zeros((n, 3, 3))
        L = L.at[:, 0, 0].set(-beta * rate)
        L = L.at[:, 1, 1].set(-beta * rate)
        L = L.at[:, 2, 2].set(rate)
        stress, s_end, _ = model.model_setup(dt, L, state,
                                             compute_tangent=False)
        lat = jnp.sum(wj * 0.5 * (stress[:, 0] + stress[:, 1]))
        szz = jnp.sum(wj * stress[:, 2])
        return s_end, lat, szz

    curve = []
    beta = 0.35
    for dt in dts:
        b0, b1 = beta, beta + 0.02
        _, f0, _ = step(state, dt, b0)
        _, f1, _ = step(state, dt, b1)
        for _ in range(4):
            b2 = b1 - float(f1) * (b1 - b0) / (float(f1 - f0) + 1e-30)
            b2 = min(max(b2, 0.0), 1.0)
            b0, f0 = b1, f1
            b1 = b2
            _, f1, _ = step(state, dt, b1)
        state, lat, szz = step(state, dt, b1)
        beta = b1
        curve.append(float(szz))
    return np.array(curve)


def golden(xtal, nsteps=40):
    f = ("mtsdd_full_stress.txt" if xtal == "fcc"
         else "mtsdd_bcc_stress.txt")
    return np.loadtxt(os.path.join(DATA, f))[:nsteps, 2]


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "fit"
    quats, w = load_aggregate()

    if mode == "curve":
        k1, k2, a, b = map(float, sys.argv[2:6])
        xtal = sys.argv[6] if len(sys.argv) > 6 else "fcc"
        m = build(xtal, k1, k2, a, b)
        c = taylor_curve(m, quats, w)
        g = golden(xtal, len(c))
        for i, (x, y) in enumerate(zip(c, g)):
            print(f"{i+1:3d} {x:.5f} {y:.5f} {(x-y)/g.max():+.5f}")
        print("rel-rms:",
              float(np.sqrt(np.mean(((c - g) / g.max()) ** 2))))
        return

    xtal = sys.argv[2] if len(sys.argv) > 2 else "fcc"
    if len(sys.argv) > 3:
        k1, k2, a, b = map(float, sys.argv[3:7])
    elif xtal == "fcc":
        k1, k2, a, b = 19.363, 511.30, 0.0, 1.0
    else:
        k1, k2, a, b = 64.331, 702.32, 0.0, 1.0
    gold = golden(xtal)

    from scipy.optimize import minimize

    best = [None, np.inf]

    def f(x):
        lk1, lk2, a, b = x
        m = build(xtal, np.exp(lk1), np.exp(lk2), a, b)
        c = taylor_curve(m, quats, w, nsteps=len(gold))
        ls = float(np.sqrt(np.mean(((c - gold) / gold.max()) ** 2)))
        if ls < best[1]:
            best[0], best[1] = x.copy(), ls
        print(f"k1={np.exp(lk1):9.3f} k2={np.exp(lk2):10.3f} "
              f"a={a:+.4f} b={b:+.4f} loss={ls:.6f}", flush=True)
        return ls

    r = minimize(f, [np.log(k1), np.log(k2), a, b], method="Nelder-Mead",
                 options=dict(maxiter=150, xatol=1e-4, fatol=1e-7))
    lk1, lk2, a, b = r.x
    print(f"RESULT {xtal}: k1={np.exp(lk1):.4f} k2={np.exp(lk2):.4f} "
          f"a={a:.5f} b={b:.5f} loss={r.fun:.6f}")


if __name__ == "__main__":
    main()
