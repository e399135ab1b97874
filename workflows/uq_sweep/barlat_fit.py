#!/usr/bin/env python3
"""Barlat Yld2004-18p anisotropic yield-surface fit.

Workflow parity with the reference's Stage3 post-processing
(workflows/Stage3/postprocessing/barlat_optimize.py, 1020 LoC): fit the
18-parameter Barlat Yld2004-18p yield criterion [Barlat et al., IJP 21
(2005) 1009] to the flow-stress states produced by the loading sweep
(loading_sweep.py --out sweep -> sweep_flow.json), optionally with
r-value (plastic strain-ratio) targets via the associated flow rule.

Yld2004-18p:
    s'  = C' : dev(sigma),  s'' = C'' : dev(sigma)
    phi = sum_{i,j=1..3} |S'_i - S''_j|^a  = 4 sigma_bar^a
with S'_i, S''_j the principal values of s', s''.  C' and C'' are each
parameterized by 9 coefficients acting on deviatoric Voigt components
(the classic c_12, c_13, c_21, c_23, c_31, c_32, c_44, c_55, c_66).
With all coefficients 1 and a = 2 the criterion reduces exactly to von
Mises (used as the self-test).  Exponent a is conventionally 8 for FCC
and 6 for BCC.

Usage:
  python workflows/uq_sweep/barlat_fit.py sweep_out/flow_states.json
      [-a 8] [--r-values rz.json] [--out barlat_params.json]
"""

from __future__ import annotations

import argparse
import json

import numpy as np

VOIGT = [(0, 0), (1, 1), (2, 2), (1, 2), (0, 2), (0, 1)]


def c_matrix(c):
    """Barlat linear-transformation matrix (6x6) from its 9 coefficients.

    Acts on the deviatoric stress in Voigt order
    [s11, s22, s33, s23, s13, s12].
    """
    c12, c13, c21, c23, c31, c32, c44, c55, c66 = c
    m = np.zeros((6, 6))
    m[0, 1], m[0, 2] = -c12, -c13
    m[1, 0], m[1, 2] = -c21, -c23
    m[2, 0], m[2, 1] = -c31, -c32
    m[3, 3], m[4, 4], m[5, 5] = c44, c55, c66
    return m


def _principal(svec):
    m = np.array([[svec[0], svec[5], svec[4]],
                  [svec[5], svec[1], svec[3]],
                  [svec[4], svec[3], svec[2]]])
    return np.linalg.eigvalsh(m)


def dev_voigt(sig_voigt):
    p = (sig_voigt[0] + sig_voigt[1] + sig_voigt[2]) / 3.0
    d = np.array(sig_voigt, dtype=float)
    d[:3] -= p
    return d


def phi(sig_voigt, c1, c2, a):
    """Yld2004-18p effective stress sigma_bar for one Voigt stress."""
    d = dev_voigt(sig_voigt)
    sp = _principal(c_matrix(c1) @ d)
    spp = _principal(c_matrix(c2) @ d)
    val = np.sum(np.abs(sp[:, None] - spp[None, :]) ** a)
    return (val / 4.0) ** (1.0 / a)


def grad_phi(sig_voigt, c1, c2, a, eps=1e-7):
    """d sigma_bar / d sigma (Voigt, engineering off-diagonal pairing)."""
    g = np.zeros(6)
    for k in range(6):
        dp = np.array(sig_voigt, dtype=float)
        dm = np.array(sig_voigt, dtype=float)
        dp[k] += eps
        dm[k] -= eps
        g[k] = (phi(dp, c1, c2, a) - phi(dm, c1, c2, a)) / (2 * eps)
    return g


def r_value(c1, c2, a, theta):
    """Lankford r(theta) for in-plane uniaxial tension at angle theta.

    r = eps_dot_width / eps_dot_thickness via the associated flow rule
    (both contractile in tension, so the ratio is positive; von Mises
    gives r = 1 at every angle).
    """
    ct, st = np.cos(theta), np.sin(theta)
    sig = np.array([ct * ct, st * st, 0.0, 0.0, 0.0, ct * st])
    g = grad_phi(sig, c1, c2, a)
    # in-plane width direction w = (-st, ct, 0): eps_w = w . eps . w.
    # g[5] differentiates the TIED Voigt slot (s12 and s21 together), so
    # the tensor component derivative is g[5]/2; the w.eps.w expansion
    # carries 2*st*ct, leaving a single st*ct*g[5] term.
    d_w = (g[0] * st * st + g[1] * ct * ct - g[5] * st * ct)
    d_t = g[2]
    return d_w / d_t if abs(d_t) > 1e-14 else np.inf


def fit(stress_states, a=8.0, r_targets=None, w_r=1.0, maxiter=400):
    """Least-squares fit of the 18 coefficients to yield-point stresses.

    stress_states: (n, 6) Voigt stresses ON the yield surface (each row a
    flow-stress measurement from one loading direction).  A perfect fit
    makes sigma_bar constant over the states, so the residuals are
    sigma_bar(sig_k)/mean(sigma_bar) - 1, plus a weak Tikhonov pull of
    the coefficients toward 1 (the transformation pair is scale- and
    permutation-degenerate; the prior pins one representative).
    """
    from scipy.optimize import least_squares

    S = np.atleast_2d(np.asarray(stress_states, dtype=float))

    def residuals(x):
        c1, c2 = x[:9], x[9:18]
        sb = np.array([phi(s, c1, c2, a) for s in S])
        y = max(float(np.mean(sb)), 1e-12)
        r = list(sb / y - 1.0)
        r += list(1e-3 * (x - 1.0))
        if r_targets:
            for theta_deg, r_obs in r_targets:
                r.append(w_r * (r_value(c1, c2, a,
                                        np.deg2rad(theta_deg)) - r_obs))
        return np.asarray(r)

    x0 = np.ones(18)
    sol = least_squares(residuals, x0, max_nfev=maxiter, xtol=1e-12)
    c1, c2 = sol.x[:9], sol.x[9:18]
    sb = np.array([phi(s, c1, c2, a) for s in S])
    y = float(np.mean(sb))
    return {"c_prime": c1.tolist(), "c_dprime": c2.tolist(), "a": a,
            "sigma_bar_ref": y, "cost": float(sol.cost),
            "rms": float(np.sqrt(np.mean((sb / y - 1.0) ** 2)))}


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("flow_json", help="loading_sweep output "
                    "(list of {direction, flow_stress_voigt})")
    ap.add_argument("-a", type=float, default=8.0,
                    help="Barlat exponent (8 FCC, 6 BCC)")
    ap.add_argument("--r-values", default=None,
                    help="JSON list of [theta_deg, r] targets")
    ap.add_argument("--out", default="barlat_params.json")
    args = ap.parse_args()

    with open(args.flow_json) as f:
        rows = json.load(f)
    stresses = [r["flow_stress_voigt"] if isinstance(r, dict) else r
                for r in rows]
    r_targets = None
    if args.r_values:
        with open(args.r_values) as f:
            r_targets = json.load(f)

    res = fit(stresses, a=args.a, r_targets=r_targets)
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    print(f"wrote {args.out}: rms={res['rms']:.3e} a={res['a']}")


if __name__ == "__main__":
    main()
