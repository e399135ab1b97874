"""Isolated A/B of the f32 dogleg stage: XLA (dogleg_cm) vs Pallas.

Round-3 verdict item 4: the full-step bench showed pallas_speedup ~1.0
at a 16^3 batch and never said why.  This measures the exact stage the
kernel replaces — the batched trust-region dogleg on the f32 point
solve — in isolation, at production batch sizes (default 48^3-scale,
884736 points), with realistic inputs (random orientations, uniaxial
deviatoric rate at 1e-3/s, the production initial-guess heuristic).

Reports per backend: wall ms (best of reps), iteration stats, and for
the XLA stage the compiled cost-analysis FLOPs/bytes -> achieved
GFLOP/s and HBM GB/s, i.e. whether the stage is compute- or
bandwidth-bound (the roofline fact that decides whether VMEM residency
can win at all).

Usage: python pallas_stage_bench.py [N] [--dt 0.005] [--reps 5]
       [--tile 512]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

DATA = "/root/reference/test/data"
PEAK_BF16 = 197e12
PEAK_HBM_BW = 819e9


def build_inputs(model, N, dt, seed=0):
    from exaconstit_tpu.models import evptn_cm as cm

    rng = np.random.default_rng(seed)
    q = rng.normal(size=(4, N))
    q /= np.linalg.norm(q, axis=0, keepdims=True)
    f32 = jnp.float32
    q0 = jnp.asarray(q, f32)
    e0 = jnp.zeros((5, N), f32)
    g0 = float(model.kinetics.g0)
    # spread of hardness states (developing flow hardens the CRSS)
    h0 = jnp.asarray(g0 * (1.0 + 0.3 * rng.random(N))[None, :], f32)
    # uniaxial tension along z at 1e-3/s: deviatoric sample-frame rate
    D = np.diag([-0.5e-3, -0.5e-3, 1.0e-3])
    d_vecd = np.asarray(
        [(D[0, 0] - D[1, 1]) / 2.0 * np.sqrt(2.0), D[2, 2] * np.sqrt(1.5),
         D[1, 2] * np.sqrt(2.0), D[0, 2] * np.sqrt(2.0),
         D[0, 1] * np.sqrt(2.0)])
    # match the package's vecd convention via its own converter
    from exaconstit_tpu.utils.tensors import mat_to_vecd
    d_vecd = np.asarray(mat_to_vecd(jnp.asarray(D)[None]))[0]
    d_cm = jnp.asarray(np.repeat(d_vecd[:, None], N, axis=1), f32)
    w_cm = jnp.zeros((3, N), f32)
    dts = jnp.full((N,), dt, f32)

    # develop plastic flow: ~1% strain through the real staggered solve
    # (a zero-strain start solves trivially in 0 dogleg iterations —
    # the production-relevant stage operates ON the flow surface).
    # Warm a SUBSET of the batch and tile it up: warming all 884k
    # points through 8 full staggered solves is a single >60s device
    # execution, which the axon tunnel watchdog kills.
    Nw = min(N, 65536)
    ew, qw, hw = e0[:, :Nw], q0[:, :Nw], h0[:, :Nw]
    nsub = jnp.full((Nw,), 13, jnp.int32)  # ceil(1.0 / 0.08)
    warm = jax.jit(lambda e, q, h: cm.solve_staggered_cm_core(
        model, 1.0, d_cm[:, :Nw], w_cm[:, :Nw], e, q, h, 298.0, nsub))
    for _ in range(8):
        xw, h_end, _, _, _ = warm(ew, qw, hw)
        ew, hw = xw[:5], h_end
    jax.block_until_ready(hw)
    reps_n = -(-N // Nw)  # ceil
    e0 = jnp.tile(ew, (1, reps_n))[:, :N]
    q0 = jnp.tile(qw, (1, reps_n))[:, :N]
    h0 = jnp.tile(hw, (1, reps_n))[:, :N]

    Dsm = cm.vecd_to_mat_cm(d_cm)
    deff = jnp.sqrt(2.0 / 3.0 * jnp.sum(d_cm * d_cm, axis=0))
    e_guess = cm._initial_guess_cm(model, dts, Dsm, deff, e0, q0, h0)
    x0 = jnp.concatenate([e_guess, jnp.zeros((3, N), f32)], axis=0)
    active = jnp.ones((N,), bool)
    return x0, h0, dts, d_cm, Dsm, w_cm, e0, q0, active


def run_ab(N=884736, dt=0.005, reps=5, skip_pallas=False):
    """Isolated XLA-vs-Pallas A/B of the f32 dogleg stage.

    Returns a dict of measurements (times in seconds); importable from
    bench.py so the round record carries the production-batch stage
    comparison, not just the 16^3 full-step proxy."""
    jax.config.update("jax_enable_x64", True)  # production config
    from exaconstit_tpu.config.options import (ExaOptions, MechType,
                                               SlipType, XtalType)
    from exaconstit_tpu.models import evptn_cm as cm
    from exaconstit_tpu.models.ecmech import build_model
    from exaconstit_tpu.solvers.dogleg_pallas import dogleg_pallas

    opt = ExaOptions()
    opt.mech_type = MechType.EXACMECH
    opt.xtal_type = XtalType.FCC
    opt.slip_type = SlipType.POWERVOCE
    props = np.loadtxt(os.path.join(DATA, "props_cp_voce.txt"))
    model = build_model(opt, props)
    ev = model.evptn

    print(f"backend={jax.default_backend()} N={N} dt={dt} "
          f"tol={ev.fast_tol} max_iter={ev.solver_max_iter}", flush=True)
    x0, h0, dts, d_cm, Dsm, w_cm, e0, q0, active = build_inputs(
        ev, N, dt)
    temp_k = 298.0
    res = {"n": N, "dt": dt}

    # ---- XLA stage ------------------------------------------------------
    def xla_stage(x0, h0, dts, Dsm, w_cm, e0, q0, active):
        def rj(x):
            return cm.residual_and_jac_cm(ev, x, h0, dts, Dsm, w_cm, e0,
                                          q0, temp_k)
        x, ok, iters, _, J = cm.dogleg_cm(rj, x0, ev.fast_tol,
                                          ev.solver_max_iter,
                                          active0=active)
        return x, ok, iters, J

    xla_jit = jax.jit(xla_stage)
    out = xla_jit(x0, h0, dts, Dsm, w_cm, e0, q0, active)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = xla_jit(x0, h0, dts, Dsm, w_cm, e0, q0, active)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    t_xla = min(ts)
    iters = np.asarray(out[2])
    ok = np.asarray(out[1])
    res.update(t_xla=t_xla, xla_conv=float(ok.mean()),
               iters_mean=float(iters.mean()))
    print(f"XLA   : {t_xla*1e3:9.2f} ms  conv={ok.mean():.4f} "
          f"iters mean={iters.mean():.2f} max={iters.max()}", flush=True)
    try:
        comp = xla_jit.lower(x0, h0, dts, Dsm, w_cm, e0, q0,
                             active).compile()
        ca = comp.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        flops = float(ca.get("flops", 0.0))
        bts = float(ca.get("bytes accessed", 0.0))
        print(f"XLA cost model: {flops/1e9:.1f} GFLOP, {bts/1e9:.2f} GB "
              f"-> {flops/t_xla/1e12:.3f} TFLOP/s "
              f"({flops/t_xla/PEAK_BF16*100:.2f}% bf16 peak), "
              f"{bts/t_xla/1e9:.1f} GB/s "
              f"({bts/t_xla/PEAK_HBM_BW*100:.1f}% HBM)", flush=True)
        print(f"  per point: {flops/N:.0f} FLOP, {bts/N:.0f} B", flush=True)
        res.update(xla_flops_per_pt=flops / N, xla_bytes_per_pt=bts / N,
                   xla_hbm_util=bts / t_xla / PEAK_HBM_BW)
    except Exception as e:
        print(f"cost analysis unavailable: {e}", flush=True)

    if skip_pallas:
        return res

    # ---- Pallas stage ---------------------------------------------------
    def pl_stage(x0, h0, dts, d_cm, w_cm, e0, q0, active):
        x, ok, iters, _, J = dogleg_pallas(
            ev, x0, h0, dts, d_cm, w_cm, e0, q0, active, ev.fast_tol,
            ev.solver_max_iter)
        return x, ok, iters, J

    pl_jit = jax.jit(pl_stage)
    outp = pl_jit(x0, h0, dts, d_cm, w_cm, e0, q0, active)
    jax.block_until_ready(outp)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        outp = pl_jit(x0, h0, dts, d_cm, w_cm, e0, q0, active)
        jax.block_until_ready(outp)
        ts.append(time.perf_counter() - t0)
    t_pl = min(ts)
    itp = np.asarray(outp[2])
    okp = np.asarray(outp[1])
    print(f"Pallas: {t_pl*1e3:9.2f} ms  conv={okp.mean():.4f} "
          f"iters mean={itp.mean():.2f} max={itp.max()} "
          f"tile={os.environ.get('EXACONSTIT_PALLAS_TILE', '512')}",
          flush=True)
    print(f"SPEEDUP pallas/xla = {t_xla/t_pl:.3f}x", flush=True)
    dx = np.abs(np.asarray(out[0]) - np.asarray(outp[0])).max()
    print(f"max |x_xla - x_pallas| = {dx:.3e}", flush=True)
    res.update(t_pallas=t_pl, pallas_conv=float(okp.mean()),
               speedup=t_xla / t_pl, max_abs_diff=float(dx))
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n", nargs="?", type=int, default=884736)
    ap.add_argument("--dt", type=float, default=0.005)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--tile", type=int, default=None)
    ap.add_argument("--skip-pallas", action="store_true")
    args = ap.parse_args()
    if args.tile:
        os.environ["EXACONSTIT_PALLAS_TILE"] = str(args.tile)
    run_ab(args.n, args.dt, args.reps, args.skip_pallas)


if __name__ == "__main__":
    main()
