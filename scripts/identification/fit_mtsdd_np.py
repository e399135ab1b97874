"""Nonparametric hardening identification for the MTSDD goldens.

Every parametric family tried so far (4/6/8-parameter generalized
Kocks-Mecking, C'-pinned physical exponents) floors at ~1.7e-2 FEM
max-rel with the same knee-shaped residual.  This script asks the
decisive question: is the residual in the HARDENING LAW at all?

It replaces the density evolution with a FREE-FORM monotone map
  dg/dGamma = f(g),  f = exp(piecewise-linear(g; knots)),
where g is the slip strength itself (state h := g, strength(h) = h).
This family is a superset of every (k1, k2, a, b)-style law expressed
through g = go + s*sqrt(rho):  any smooth positive f is representable,
so

  * if the space-mapped FEM error drops well below 1.7e-2, the
    parametric families were simply wrong and the implied f tells us
    the true structure;
  * if it floors at the same knee ceiling, the mismatch is NOT in the
    hardening law (it lives in the slip kinetics / elastic-plastic
    transition / integration scheme), which is a floor proof for the
    entire Kocks-Mecking class the reference documents.

Usage:
  python fit_mtsdd_np.py taylor [fcc|bcc]          # fast feasibility
  python fit_mtsdd_np.py fem    [fcc|bcc]          # space-mapping loop
  python fit_mtsdd_np.py curve  [fcc|bcc] <theta-csv>
Options: --knots K (default 12) --c1 (also fit a c1 scale)
         --rounds N --lm-iters N --fem-log LOG
"""
import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ["EXACONSTIT_MTSDD_CAL"] = "file"
# solver-boundary IFT tangents for jacfwd (evptn_cm._ift_tangents);
# the FEM legs run in subprocesses WITHOUT this flag, so their value
# path is the production one
os.environ["EXACONSTIT_IFT_TANGENTS"] = "1"

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from fit_mtsdd3 import (RATE, base_model, golden,  # noqa: E402
                        load_aggregate)
from fit_mtsdd5 import parse_fem_log  # noqa: E402

from exaconstit_tpu.models.kinetics import KMBalD, SplineG  # noqa: E402

DATA = "/root/reference/test/data"


def spline_kin(kin0, knots, log_f, c1_scale=None):
    vals = {f.name: getattr(kin0, f.name)
            for f in dataclasses.fields(KMBalD)}
    if c1_scale is not None:
        vals["c1"] = vals["c1"] * c1_scale
    return SplineG(**vals, g_knots=tuple(knots), log_f=log_f)


def make_curve_np(model0, quats, w, dts, knots, with_c1, sens):
    """Self-consistent relaxed-Taylor curve: the lateral-relaxation
    coefficient beta is solved INSIDE each scan step (2 Newton
    corrections on the lateral stress with the precomputed elastic
    sensitivity ``sens``, warm-started from the previous step), so the
    curve is a deterministic, fully differentiable function of theta
    alone — unlike the fit_mtsdd3/5 outer beta fixed-point, whose
    re-relaxation made the LM objective noisy and its Jacobian ignore
    dbeta/dtheta."""
    # initial state with the new hardness variable (g instead of rho)
    kin0 = model0.evptn.kinetics
    probe = spline_kin(kin0, knots, np.zeros(len(knots)))
    mprobe = dataclasses.replace(
        model0, evptn=dataclasses.replace(model0.evptn, kinetics=probe))
    state0 = jnp.asarray(mprobe.init_state(quats))
    wj = jnp.asarray(w)
    n = quats.shape[0]
    dts = jnp.asarray(dts)
    sens = jnp.asarray(sens)

    def curve(theta):
        log_f = theta[:len(knots)]
        c1s = jnp.exp(theta[len(knots)]) if with_c1 else None
        kin = spline_kin(kin0, knots, log_f, c1s)
        ev = dataclasses.replace(model0.evptn, kinetics=kin)
        model = dataclasses.replace(model0, evptn=ev)

        def eval_at(beta, state, dt):
            L = jnp.zeros((n, 3, 3))
            L = L.at[:, 0, 0].set(-beta * RATE)
            L = L.at[:, 1, 1].set(-beta * RATE)
            L = L.at[:, 2, 2].set(RATE)
            stress, s_end, _ = model.model_setup(dt, L, state,
                                                 compute_tangent=False)
            szz = jnp.sum(wj * stress[:, 2])
            lat = jnp.sum(wj * 0.5 * (stress[:, 0] + stress[:, 1]))
            return szz, lat, s_end

        def step(carry, xs):
            state, beta = carry
            dt, sens_k = xs
            for _ in range(3):  # Newton on lat(beta); elastically stiff
                _, lat, _ = eval_at(beta, state, dt)
                beta = jnp.clip(beta - lat / sens_k, 0.0, 1.0)
            szz, lat, s_end = eval_at(beta, state, dt)
            beta_next = jnp.clip(beta - lat / sens_k, 0.0, 1.0)
            return (s_end, beta_next), (szz, lat)

        (_, _), (szz, lat) = lax.scan(step, (state0, jnp.asarray(0.45)),
                                      (dts, sens))
        return szz, lat

    return jax.jit(curve)


def init_theta(xtal, knots, with_c1, gold, dts):
    """Seed log_f from the implied dg/dGamma chain (crude Taylor link).

    `gold` may be any target curve (e.g. the ratio-corrected
    space-mapping target), not just the golden itself."""
    mu, tK = 47.26, 298.0
    c1, tau_a = 1.944106926e3, 4.0e-4
    M = 3.06 if xtal == "fcc" else 2.75
    t = np.cumsum(dts)
    eps = t * RATE
    szz = gold
    E = szz[0] / eps[0]
    eps_pl = eps - szz / E
    Gam = M * eps_pl
    tau = szz / M
    x = 1.0 + np.log(M * RATE / 1.0) / (c1 * mu / tK)
    g = (tau - tau_a) / x
    m = eps_pl > 1e-4
    dg = np.gradient(g[m], Gam[m])
    logf = np.interp(knots, g[m], np.log(np.clip(dg, 1e-3, None)))
    # decay the tail: saturation beyond the data
    logf[knots > g[m].max()] = logf[np.searchsorted(knots, g[m].max()) - 1]
    th = list(logf)
    if with_c1:
        th.append(0.0)
    return np.array(th)


def cal_env(knots, theta, with_c1):
    """EXACONSTIT_MTSDD_CAL_NP value: knots|log_f[|c1_scale]."""
    s = (",".join(f"{v:.10g}" for v in knots) + "|"
         + ",".join(f"{v:.10g}" for v in theta[:len(knots)]))
    if with_c1:
        s += f"|{float(np.exp(theta[len(knots)])):.10g}"
    return s


def run_fem_curve_np(xtal, knots, theta, with_c1, tag):
    import subprocess
    import tempfile
    if os.environ.get("FITNP_FEM_TPU") == "1":
        # run the FEM leg on the tunnel (MTSDD solves are pure f64 —
        # emulated on TPU but bit-compatible at the 1e-3 bar; ~10x
        # faster than this box's single CPU core).  The parent fitter
        # runs on CPU (env -u PALLAS_AXON_POOL_IPS), so the tunnel
        # address is restored from EXACONSTIT_TPU_TUNNEL, mirroring
        # run_tests.sh / tests/test_full_regression_tpu.py.
        env = dict(os.environ)
        addr = env.get("EXACONSTIT_TPU_TUNNEL")
        if addr and not env.get("PALLAS_AXON_POOL_IPS"):
            env["PALLAS_AXON_POOL_IPS"] = addr
            env.pop("JAX_PLATFORMS", None)
            env["XLA_FLAGS"] = " ".join(
                f for f in env.get("XLA_FLAGS", "").split()
                if "host_platform_device_count" not in f)
            env["PYTHONPATH"] = ("/root/repo" + os.pathsep
                                 + "/root/.axon_site" + os.pathsep
                                 + env.get("PYTHONPATH", ""))
    else:
        env = {k: v for k, v in os.environ.items()
               if k != "PALLAS_AXON_POOL_IPS"}
        env["JAX_PLATFORMS"] = "cpu"
    env["EXACONSTIT_MTSDD_CAL_NP"] = cal_env(knots, theta, with_c1)
    # the FEM truth must run the PRODUCTION value path (no straight-
    # through IFT correction terms — those are for this process's
    # jacfwd only)
    env.pop("EXACONSTIT_IFT_TANGENTS", None)
    work = tempfile.mkdtemp(prefix=f"fitnp_{tag}_")
    t0 = time.time()
    out = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "mtsdd_fem_curve.py"), xtal, work,
         str(int(os.environ.get("FIT5_FEM_STEPS", "32")))],
        env=env, capture_output=True, text=True)
    rows = parse_fem_log(out.stdout)
    print(f"  FEM curve [{tag}]: {len(rows)} steps in "
          f"{time.time() - t0:.0f}s", flush=True)
    if len(rows) == 0:
        print(out.stdout[-2000:])
        print(out.stderr[-2000:])
    return rows


def estimate_sens(model0, quats, w, dts, knots, with_c1, theta):
    """d(lat_k)/d(beta_k) by finite difference on a fixed-beta probe
    curve (elastically stiff; used as the in-step Newton slope)."""
    kin0 = model0.evptn.kinetics
    probe = spline_kin(kin0, knots, np.asarray(theta[:len(knots)]))
    mprobe = dataclasses.replace(
        model0, evptn=dataclasses.replace(model0.evptn, kinetics=probe))
    state0 = jnp.asarray(mprobe.init_state(quats))
    wj = jnp.asarray(w)
    n = quats.shape[0]

    @jax.jit
    def lat_curve(betas):
        kin = spline_kin(kin0, knots, jnp.asarray(theta[:len(knots)]))
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
            lat = jnp.sum(wj * 0.5 * (stress[:, 0] + stress[:, 1]))
            return s_end, lat

        _, lat = lax.scan(step, state0, (jnp.asarray(dts), betas))
        return lat

    b0 = jnp.full(len(dts), 0.45)
    eps = 1e-3
    l0 = np.asarray(lat_curve(b0))
    l1 = np.asarray(lat_curve(b0 + eps))
    return (l1 - l0) / eps


def save_ckpt(path, knots, theta, ratio, rnd, loss):
    """Persist the fit state so a killed session can resume."""
    if not path:
        return
    import json
    with open(path, "w") as f:
        json.dump({"knots": list(map(float, knots)),
                   "theta": list(map(float, theta)),
                   "ratio": list(map(float, ratio)),
                   "round": int(rnd), "loss": float(loss)}, f)


def lm_fit(curve, jac, theta, target, scale, iters, tag, on_accept=None):
    lam = 1e-2
    t0 = time.time()
    for it in range(iters):
        szz = np.asarray(curve(jnp.asarray(theta))[0])
        r = (szz - target) / scale
        loss = float(np.sqrt(np.mean(r ** 2)))
        J = np.asarray(jac(jnp.asarray(theta))) / scale
        JtJ = J.T @ J
        g = J.T @ r
        improved, l_new = False, loss
        for _ in range(10):
            dth = np.linalg.solve(
                JtJ + lam * np.diag(np.diag(JtJ) + 1e-10), -g)
            dth = np.clip(dth, -1.5, 1.5)
            th_new = theta + dth
            szz_n = np.asarray(curve(jnp.asarray(th_new))[0])
            l_new = float(np.sqrt(np.mean(((szz_n - target) / scale) ** 2)))
            if l_new < loss:
                theta, lam = th_new, max(lam / 3, 1e-7)
                improved = True
                if on_accept is not None:
                    on_accept(theta, l_new)
                break
            lam *= 10
        print(f"  [{tag}] it{it:2d} loss={loss:.4e}"
              f"{' -> ' + format(l_new, '.4e') if improved else ' (stall)'}"
              f" ({time.time() - t0:.0f}s)", flush=True)
        if not improved:
            break
    return theta


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["taylor", "fem", "curve"])
    ap.add_argument("xtal", choices=["fcc", "bcc"])
    ap.add_argument("theta", nargs="?", default=None)
    ap.add_argument("--knots", type=int, default=12)
    ap.add_argument("--c1", action="store_true")
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--lm-iters", type=int, default=15)
    ap.add_argument("--fem-log", default=None)
    ap.add_argument("--ckpt", default=None,
                    help="JSON checkpoint path (saved on every accepted "
                         "LM step; pass an existing one to resume theta)")
    args = ap.parse_args()

    quats, w = load_aggregate()
    gold = golden(args.xtal)
    dts = np.loadtxt(os.path.join(DATA, "custom_dt.txt"))[:len(gold)]
    m0 = base_model(args.xtal)
    kin0 = m0.evptn.kinetics
    g0 = kin0.go + kin0.s * np.sqrt(kin0.rho_dd_init)
    # knot span: initial strength to just above the implied saturation
    M = 3.06 if args.xtal == "fcc" else 2.75
    g_max = 1.15 * (gold.max() / M - kin0.tau_a)
    knots = np.linspace(g0 * 0.999, g_max, args.knots)
    scale = gold.max()

    resumed_ratio = None
    if args.theta:
        theta = np.array([float(v) for v in args.theta.split(",")])
    elif args.ckpt and os.path.exists(args.ckpt):
        import json
        ck = json.load(open(args.ckpt))
        theta = np.array(ck["theta"])
        resumed_ratio = np.array(ck["ratio"])
        print(f"resumed ckpt round={ck['round']} loss={ck['loss']:.4e}",
              flush=True)
    else:
        theta = init_theta(args.xtal, knots, args.c1, gold, dts)
    print(f"knots={np.array2string(knots, precision=5)}", flush=True)
    print(f"theta0={np.array2string(theta, precision=4)}", flush=True)

    t0 = time.time()
    sens = estimate_sens(m0, quats, w, dts, knots, args.c1, theta)
    print(f"sens range [{sens.min():.3e}, {sens.max():.3e}] "
          f"({time.time()-t0:.0f}s)", flush=True)
    curve = make_curve_np(m0, quats, w, dts, knots, args.c1, sens)
    jac = jax.jit(jax.jacfwd(lambda th: curve(th)[0]))

    szz, lat = curve(jnp.asarray(theta))
    err = (np.asarray(szz) - gold) / scale
    print(f"init: |lat|max={np.abs(np.asarray(lat)).max():.2e} "
          f"rms={np.sqrt(np.mean(err**2)):.4e} max={np.abs(err).max():.4e}"
          f" ({time.time()-t0:.0f}s)", flush=True)

    if args.mode == "curve":
        for i, e in enumerate(err):
            print(f"{i+1:3d} {np.asarray(szz)[i]:.5f} {gold[i]:.5f} {e:+.5f}")
        return

    if args.mode == "taylor":
        theta = lm_fit(curve, jac, theta, gold, scale,
                       args.lm_iters, "taylor")
        szz, _ = curve(jnp.asarray(theta))
        err = (np.asarray(szz) - gold) / scale
        print(f"TAYLOR-BEST rms={np.sqrt(np.mean(err**2)):.4e} "
              f"max={np.abs(err).max():.4e}", flush=True)
        print("theta=" + ",".join(f"{v:.8g}" for v in theta))
        print("  step errs: " +
              " ".join(f"{e:+.4f}" for e in err), flush=True)
        return

    # ---- fem: space-mapping loop (fit_mtsdd5 structure) ----------------
    best = (np.inf, theta.copy(),
            resumed_ratio if resumed_ratio is not None
            else np.ones(len(gold)))
    for rnd in range(args.rounds):
        if rnd == 0 and args.fem_log:
            rows = parse_fem_log(open(args.fem_log).read())
        else:
            rows = run_fem_curve_np(args.xtal, knots, theta, args.c1,
                                    f"r{rnd}")
        if len(rows) == 0:
            print("FEM curve empty; stopping")
            break
        steps = rows[:, 0].astype(int) - 1
        fem_err = np.max(np.abs(rows[:, 1] - gold[steps])) / scale
        print(f"round {rnd}: FEM max-rel={fem_err:.4e} "
              f"({len(rows)}/{len(gold)} steps)", flush=True)
        if fem_err < best[0]:
            szz0 = np.asarray(curve(jnp.asarray(theta))[0])
            ratio = np.ones(len(gold))
            ratio[steps] = np.clip(rows[:, 1] / np.maximum(
                np.abs(szz0[steps]), 1e-12), 0.5, 2.0)
            ratio[steps.max() + 1:] = ratio[steps.max()]
            best = (fem_err, theta.copy(), ratio)
        else:
            print(f"  regressed (best {best[0]:.4e})", flush=True)
            theta, ratio = best[1].copy(), best[2]
        target = gold / ratio
        # two candidate starts: the current theta, and an implied-law
        # reseed built directly from the corrected target (the LM from
        # a stale theta stalls when the ratio correction demands a big
        # coordinated move — the reseed jumps there in one step)
        reseed = init_theta(args.xtal, knots, args.c1, target, dts)
        l_cur = float(np.sqrt(np.mean((
            (np.asarray(curve(jnp.asarray(theta))[0]) - target)
            / scale) ** 2)))
        l_re = float(np.sqrt(np.mean((
            (np.asarray(curve(jnp.asarray(reseed))[0]) - target)
            / scale) ** 2)))
        print(f"  start: current loss={l_cur:.4e} reseed loss={l_re:.4e}",
              flush=True)
        if l_re < l_cur:
            theta = reseed
        theta = lm_fit(curve, jac, theta, target, scale,
                       args.lm_iters, f"r{rnd}",
                       on_accept=lambda th, l, _r=ratio, _n=rnd: save_ckpt(
                           args.ckpt, knots, th, _r, _n, l))

    print(f"BEST {args.xtal}: FEM max-rel={best[0]:.4e}")
    print("theta=" + ",".join(f"{v:.8g}" for v in best[1]))
    if args.ckpt:
        save_ckpt(args.ckpt + ".best", knots, best[1], best[2], -1, best[0])


if __name__ == "__main__":
    main()
