"""Isolate the BCC jacfwd NaN to a single step and a single output.

bcc_jac_probe.py showed: curve(theta0) is finite over all 40 steps, but
jacfwd NaNs from step 14 (the BCC elastic-plastic knee) onward.  This
probe replays the curve capturing the per-step state trajectory, then
takes jacfwd of ONE step at a time with the incoming state frozen
(treated as a constant), printing nonfinite counts for the step's
stress, end state (split into e/q/h blocks), and beta residual.  That
separates "the NaN is born in step k's own computation" from "state
tangents carried it in".
"""
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ["EXACONSTIT_MTSDD_CAL"] = "file"
os.environ["EXACONSTIT_IFT_TANGENTS"] = "1"

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from fit_mtsdd3 import RATE, base_model, golden, load_aggregate  # noqa
from fit_mtsdd_np import (estimate_sens, init_theta,  # noqa: E402
                          make_curve_np, spline_kin)

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
    sens = estimate_sens(m0, quats, w, dts, knots, True, theta)

    n = quats.shape[0]
    wj = jnp.asarray(w)

    def make_model(th):
        log_f = th[:len(knots)]
        c1s = jnp.exp(th[len(knots)])
        kin = spline_kin(kin0, knots, log_f, c1s)
        ev = dataclasses.replace(m0.evptn, kinetics=kin)
        return dataclasses.replace(m0, evptn=ev)

    # trajectory replay with the in-step beta Newton (make_curve_np)
    probe = spline_kin(kin0, knots, np.zeros(len(knots)))
    mprobe = dataclasses.replace(
        m0, evptn=dataclasses.replace(m0.evptn, kinetics=probe))
    state0 = jnp.asarray(mprobe.init_state(quats))

    @jax.jit
    def trajectory(th):
        model = make_model(th)

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
            for _ in range(3):
                _, lat, _ = eval_at(beta, state, dt)
                beta = jnp.clip(beta - lat / sens_k, 0.0, 1.0)
            szz, lat, s_end = eval_at(beta, state, dt)
            beta_next = jnp.clip(beta - lat / sens_k, 0.0, 1.0)
            return (s_end, beta_next), (szz, state, beta)

        (_, _), (szz, states_in, betas) = lax.scan(
            step, (state0, jnp.asarray(0.45)),
            (jnp.asarray(dts), jnp.asarray(sens)))
        return szz, states_in, betas

    t0 = time.time()
    thj = jnp.asarray(theta)
    szz, states_in, betas = trajectory(thj)
    print(f"trajectory: {time.time()-t0:.0f}s "
          f"finite={bool(np.isfinite(np.asarray(szz)).all())}", flush=True)

    def one_step(th, state, beta, dt):
        model = make_model(th)
        L = jnp.zeros((n, 3, 3))
        L = L.at[:, 0, 0].set(-beta * RATE)
        L = L.at[:, 1, 1].set(-beta * RATE)
        L = L.at[:, 2, 2].set(RATE)
        stress, s_end, _ = model.model_setup(dt, L, state,
                                             compute_tangent=False)
        return stress, s_end

    ks = [int(v) for v in os.environ.get(
        "BCC_PROBE_STEPS", "12,13,14,15,20").split(",")]
    for k in ks:
        st = states_in[k]
        bt = betas[k]
        f = lambda th: one_step(th, st, bt, float(dts[k]))
        t0 = time.time()
        Js, Jst = jax.jit(jax.jacfwd(f))(thj)
        Js, Jst = np.asarray(Js), np.asarray(Jst)
        nf_s = (~np.isfinite(Js)).sum()
        nf_st = (~np.isfinite(Jst)).sum()
        msg = (f"step {k+1}: d(stress) nonfinite={nf_s}/{Js.size} "
               f"d(state) nonfinite={nf_st}/{Jst.size} "
               f"({time.time()-t0:.0f}s)")
        if nf_st:
            # state rows: which state components NaN (per point, comp)
            badpt = (~np.isfinite(Jst)).any(axis=(0, 2)) \
                if Jst.ndim == 3 else (~np.isfinite(Jst)).any(axis=-1)
            # state layout via model indices
            bad_comp = np.argwhere((~np.isfinite(Jst)).any(
                axis=tuple(range(Jst.ndim - 1))))
            msg += f" bad-state-comps={bad_comp.ravel()[:20]}"
        print(msg, flush=True)
        if nf_s:
            badcols = (~np.isfinite(Js)).reshape(-1, Js.shape[-1]).any(0)
            print(f"  bad theta cols: {np.where(badcols)[0]}", flush=True)


if __name__ == "__main__":
    main()
