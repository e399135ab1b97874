"""Differentiable identification of the effective KMBalD evolution law.

Supersedes fit_mtsdd.py / fit_mtsdd2.py: instead of Nelder-Mead over a
secant-relaxed Taylor aggregate (minutes per function eval), the full
40-step aggregate response is a single `lax.scan` and the parameter
Jacobian comes from forward-mode AD (jacfwd works through the staggered
solve's while_loops), so the fit is Levenberg-Marquardt with exact
sensitivities.

The lateral-relaxation coefficients beta_k (relaxed-Taylor: the lateral
stress is driven to zero per step) are held in an outer fixed-point that
re-uses the scan's lateral-stress output and a finite-difference
sensitivity, refreshed every LM iteration.

Family:  drho/dGamma = k1 rho^a - k2(gdot) rho^b,
         k2 = k2_0 (gam_ro_dd/gdot)^ninv;   theta = (ln k1, ln k2_0, a, b).

Usage:
  python scripts/fit_mtsdd3.py fit  [fcc|bcc] [k1 k2 a b]
  python scripts/fit_mtsdd3.py curve [fcc|bcc] k1 k2 a b
"""
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

DATA = "/root/reference/test/data"
RATE = 1.0e-3


def load_aggregate():
    quats = np.loadtxt(os.path.join(DATA, "voce_quats.ori")).reshape(-1, 4)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    grains = np.loadtxt(os.path.join(DATA, "grains.txt")).astype(int)
    g = grains[:, -1] if grains.ndim == 2 else grains
    counts = np.bincount(g - 1, minlength=quats.shape[0]).astype(float)
    w = counts / counts.sum()
    keep = w > 0
    return quats[keep], w[keep]


def base_model(xtal):
    from exaconstit_tpu.config.options import parse_options
    from exaconstit_tpu.models.ecmech import build_model

    case = "mtsdd_full.toml" if xtal == "fcc" else "mtsdd_bcc.toml"
    opt = parse_options(os.path.join(DATA, case))
    props = np.loadtxt(os.path.join(DATA, "props_cp_mts.txt"))
    return build_model(opt, props)


def golden(xtal, nsteps=40):
    f = ("mtsdd_full_stress.txt" if xtal == "fcc"
         else "mtsdd_bcc_stress.txt")
    return np.loadtxt(os.path.join(DATA, f))[:nsteps, 2]


def make_curve(model0, quats, w, dts):
    state0 = jnp.asarray(model0.init_state(quats))
    wj = jnp.asarray(w)
    n = quats.shape[0]
    dts = jnp.asarray(dts)

    def curve(theta, betas):
        kin0 = model0.evptn.kinetics
        upd = dict(k1=jnp.exp(theta[0]), k2_0=jnp.exp(theta[1]),
                   prod_exponent=theta[2], recov_exponent=theta[3])
        if len(theta) > 4:  # extended family: flow-strength shape
            upd["s"] = kin0.s * jnp.exp(theta[4])
            upd["c1"] = kin0.c1 * jnp.exp(theta[5])
        if len(theta) > 6:  # activation-profile exponents (knee shape)
            upd["p"] = theta[6]
            upd["q"] = theta[7]
        kin = dataclasses.replace(kin0, **upd)
        ev = dataclasses.replace(model0.evptn, kinetics=kin)
        model = dataclasses.replace(model0, evptn=ev)

        def step(state, xs):
            dt, beta = xs
            L = jnp.zeros((n, 3, 3))
            L = L.at[:, 0, 0].set(-beta * RATE)
            L = L.at[:, 1, 1].set(-beta * RATE)
            L = L.at[:, 2, 2].set(RATE)
            stress, s_end, _ = model.model_setup(dt, L, state,
                                                 compute_tangent=False)
            szz = jnp.sum(wj * stress[:, 2])
            lat = jnp.sum(wj * 0.5 * (stress[:, 0] + stress[:, 1]))
            return s_end, (szz, lat)

        _, (szz, lat) = lax.scan(step, state0, (dts, betas))
        return szz, lat

    return jax.jit(curve)


def relax_betas(curve, theta, betas, sens, sweeps=3):
    """Fixed-point sweeps driving the lateral stress to zero."""
    for _ in range(sweeps):
        _, lat = curve(theta, betas)
        betas = jnp.clip(betas - np.asarray(lat) / sens, 0.0, 1.0)
    return betas


def beta_sensitivity(curve, theta, betas):
    """d(lat_k)/d(beta_k) by one-shot finite difference (diagonal)."""
    eps = 1e-3
    _, l0 = curve(theta, betas)
    _, l1 = curve(theta, betas + eps)
    # upstream cross-terms fold in; diagonal dominance is enough for the
    # fixed point (lat is elastically stiff in its own step's beta)
    return (np.asarray(l1) - np.asarray(l0)) / eps


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "fit"
    xtal = sys.argv[2] if len(sys.argv) > 2 else "fcc"
    quats, w = load_aggregate()
    gold = golden(xtal)
    dts = np.loadtxt(os.path.join(DATA, "custom_dt.txt"))[:len(gold)]
    m0 = base_model(xtal)
    curve = make_curve(m0, quats, w, dts)
    scale = gold.max()

    if len(sys.argv) > 3 + (mode == "curve"):
        off = 3
        k1, k2, a, b = map(float, sys.argv[off:off + 4])
    elif xtal == "fcc":
        k1, k2, a, b = 19.363, 511.30, 0.0, 1.0
    else:
        k1, k2, a, b = 64.331, 702.32, 0.0, 1.0
    theta = jnp.array([np.log(k1), np.log(k2), a, b])

    t0 = time.time()
    betas = jnp.full(len(gold), 0.45)
    sens = beta_sensitivity(curve, theta, betas)
    betas = relax_betas(curve, theta, betas, sens, sweeps=6)
    szz, lat = curve(theta, betas)
    print(f"init: |lat|max={np.abs(np.asarray(lat)).max():.2e} "
          f"rms={np.sqrt(np.mean(((np.asarray(szz)-gold)/scale)**2)):.6f} "
          f"({time.time()-t0:.0f}s)", flush=True)

    if mode == "curve":
        for i, (x, y) in enumerate(zip(np.asarray(szz), gold)):
            print(f"{i+1:3d} {x:.5f} {y:.5f} {(x-y)/scale:+.5f}")
        return

    jac = jax.jit(jax.jacfwd(lambda th, be: curve(th, be)[0]))
    lam = 1e-3
    best = (np.inf, theta, betas)
    for it in range(25):
        betas = relax_betas(curve, theta, betas, sens, sweeps=2)
        szz, _ = curve(theta, betas)
        r = (np.asarray(szz) - gold) / scale
        loss = float(np.sqrt(np.mean(r ** 2)))
        if loss < best[0]:
            best = (loss, theta, betas)
        J = np.asarray(jac(theta, betas)) / scale  # (40, 4)
        JtJ = J.T @ J
        g = J.T @ r
        for _ in range(8):
            try:
                dth = np.linalg.solve(JtJ + lam * np.diag(np.diag(JtJ)
                                                          + 1e-12), -g)
            except np.linalg.LinAlgError:
                lam *= 10
                continue
            th_new = theta + dth
            betas_new = relax_betas(curve, th_new, betas, sens, sweeps=2)
            szz_new, _ = curve(th_new, betas_new)
            r_new = (np.asarray(szz_new) - gold) / scale
            loss_new = float(np.sqrt(np.mean(r_new ** 2)))
            if loss_new < loss:
                theta, betas, lam = th_new, betas_new, max(lam / 3, 1e-7)
                break
            lam *= 10
        k1, k2 = np.exp(theta[0]), np.exp(theta[1])
        print(f"it{it:2d} loss={loss:.3e}->{loss_new:.3e} "
              f"k1={k1:9.3f} k2={k2:10.3f} a={theta[2]:+.4f} "
              f"b={theta[3]:+.4f} lam={lam:.1e} "
              f"({time.time()-t0:.0f}s)", flush=True)
        if abs(loss - loss_new) < 1e-8 and it > 3:
            break

    loss, theta, betas = best
    k1, k2 = np.exp(theta[0]), np.exp(theta[1])
    print(f"RESULT {xtal}: k1={k1:.4f} k2={k2:.4f} a={theta[2]:.5f} "
          f"b={theta[3]:.5f} loss={loss:.6e}")
    szz, _ = curve(theta, betas)
    for i, (x, y) in enumerate(zip(np.asarray(szz), gold)):
        print(f"{i+1:3d} {x:.5f} {y:.5f} {(x-y)/scale:+.5f}")


if __name__ == "__main__":
    main()
