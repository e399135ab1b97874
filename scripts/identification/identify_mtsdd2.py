"""Nonparametric extraction of the KMBalD density-evolution law from the
reference goldens.

Method: with the density FROZEN (k1=k2=0), the relaxed-Taylor aggregate
maps density rho -> developed flow stress F(rho) and aggregate slip rate
R(rho) at the test strain rate.  Inverting the golden stress curve
through F gives the rho(t) trajectory the reference's own evolution
produced; differencing against the accumulated slip Gamma(t) yields
drho/dGamma as DATA, whose functional shape can then be compared against
candidate structural families without committing to one beforehand.

Strength convention: g = go + s*sqrt(rho) (models/kinetics.py KMBalD).

Usage: python scripts/identify_mtsdd2.py [fcc|bcc]
"""
import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp

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


def build_frozen(xtal, rho):
    from exaconstit_tpu.config.options import parse_options
    from exaconstit_tpu.models.ecmech import build_model

    case = "mtsdd_full.toml" if xtal == "fcc" else "mtsdd_bcc.toml"
    opt = parse_options(os.path.join(DATA, case))
    props = np.loadtxt(os.path.join(DATA, "props_cp_mts.txt"))
    m = build_model(opt, props)
    kin = dataclasses.replace(m.evptn.kinetics, k1=0.0, k2_0=0.0,
                              rho_dd_init=float(rho))
    ev = dataclasses.replace(m.evptn, kinetics=kin)
    return dataclasses.replace(m, evptn=ev)


def flow_point(model, quats, w, nsteps=40, dt=0.1, settle=2e-5):
    """Developed flow stress + aggregate slip rate at frozen density.

    Steps until the stress increment per step falls below ``settle``
    (i.e., the elastic transient is fully developed), up to ``nsteps``."""
    n = quats.shape[0]
    state = jnp.asarray(model.init_state(quats))
    wj = jnp.asarray(w)

    @jax.jit
    def step(state, beta):
        L = jnp.zeros((n, 3, 3))
        L = L.at[:, 0, 0].set(-beta * RATE)
        L = L.at[:, 1, 1].set(-beta * RATE)
        L = L.at[:, 2, 2].set(RATE)
        stress, s_end, _ = model.model_setup(dt, L, state,
                                             compute_tangent=False)
        lat = jnp.sum(wj * 0.5 * (stress[:, 0] + stress[:, 1]))
        szz = jnp.sum(wj * stress[:, 2])
        gd = s_end[:, model.ind_gdot:model.ind_gdot + model.nslip]
        shr = jnp.sum(wj * jnp.sum(jnp.abs(gd), axis=1))
        return s_end, lat, szz, shr

    beta = 0.4
    szz_prev = 0.0
    for k in range(nsteps):
        b0, b1 = beta, beta + 0.02
        _, f0, _, _ = step(state, b0)
        _, f1, _, _ = step(state, b1)
        for _ in range(4):
            b2 = b1 - float(f1) * (b1 - b0) / (float(f1 - f0) + 1e-30)
            b2 = min(max(b2, 0.0), 1.0)
            b0, f0 = b1, f1
            b1 = b2
            _, f1, _, _ = step(state, b1)
        state, _, szz, shr = step(state, b1)
        beta = b1
        szz, shr = float(szz), float(shr)
        if k >= 3 and abs(szz - szz_prev) < settle:
            break
        szz_prev = szz
    return szz, shr


def main():
    xtal = sys.argv[1] if len(sys.argv) > 1 else "fcc"
    quats, w = load_aggregate()
    gname = ("mtsdd_full_stress.txt" if xtal == "fcc"
             else "mtsdd_bcc_stress.txt")
    gold = np.loadtxt(os.path.join(DATA, gname))[:, 2]
    dts = np.loadtxt(os.path.join(DATA, "custom_dt.txt"))[:len(gold)]
    t = np.cumsum(dts)

    # strength->flow-stress map at frozen densities
    rhos = np.geomspace(9e-4, 0.08, 16)
    F, R = [], []
    for rho in rhos:
        m = build_frozen(xtal, rho)
        f, r = flow_point(m, quats, w)
        F.append(f); R.append(r)
        print(f"rho={rho:.5f}  flow={f:.5f}  shrate={r:.6f}", flush=True)
    F = np.array(F); R = np.array(R)

    # invert the golden curve (skip the elastic/transition steps)
    e_eff = gold[0] / (RATE * t[0])  # step-1 elastic modulus
    print(f"E_eff={e_eff:.2f}")
    i0 = 3
    rho_t = np.interp(gold[i0:], F, rhos)
    shr_t = np.interp(rho_t, rhos, R)
    # plastic fraction correction for Gamma accumulation
    dsdt = np.gradient(gold, t)
    frac = np.clip(1.0 - dsdt / (e_eff * RATE), 0.0, 1.0)
    dgam = shr_t * dts[i0:] * frac[i0:]
    gamma = np.cumsum(dgam)

    print("\n step     t      szz      rho       Gamma    drho/dGam")
    drho = np.gradient(rho_t, gamma)
    for k in range(len(rho_t)):
        print(f"{k+i0+1:4d} {t[k+i0]:7.3f} {gold[k+i0]:.5f} "
              f"{rho_t[k]:.6f} {gamma[k]:.6f} {drho[k]:10.4f}")

    # candidate families, least squares on (rho, drho/dGamma)
    x, y = rho_t, drho
    A1 = np.vstack([np.ones_like(x), -x]).T            # a - b rho
    A2 = np.vstack([np.sqrt(x), -x]).T                 # a sqrt(rho) - b rho
    A3 = np.vstack([np.sqrt(x), -x * np.sqrt(x)]).T    # a sqrt - b rho^1.5
    for name, A in [("affine: a - b*rho", A1),
                    ("km: a*sqrt(rho) - b*rho", A2),
                    ("a*sqrt(rho) - b*rho^1.5", A3)]:
        c, res, *_ = np.linalg.lstsq(A, y, rcond=None)
        pred = A @ c
        rms = np.sqrt(np.mean((pred - y) ** 2)) / np.sqrt(np.mean(y ** 2))
        print(f"{name:28s} a={c[0]:10.4f} b={c[1]:10.4f} rel-rms={rms:.4f}")


if __name__ == "__main__":
    main()
