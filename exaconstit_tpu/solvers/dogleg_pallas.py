"""VMEM-resident Pallas TPU kernel for the batched trust-region dogleg.

This is the hot loop of the whole framework: the f32 stage of the
per-quadrature-point implicit crystal-plasticity solve (the ExaCMech
`getResponseECM` equivalent, reference src/mechanics_ecmech.cpp:176-186;
SURVEY.md section 3.4 "HOTTEST LOOP").

Why a kernel: under XLA, the masked batched `lax.while_loop` in
`evptn_cm.dogleg_cm` materializes its carry — x (8), r (8), J (64),
delta/done/iters per point, ~340 B/point in f32 — through HBM on every
trust-region iteration, and every lane keeps executing until the LAST
point of the whole batch converges.  This kernel runs the entire dogleg
iteration per point-tile out of VMEM:

  * the carry never leaves VMEM (zero HBM traffic per iteration beyond
    the one-time tile load/store), and
  * each tile exits as soon as ITS lanes converge, so the tail of slow
    points no longer serializes the full batch (points cluster by grain
    orientation, which makes per-tile iteration counts coherent).

The math is the same component-major formulation as evptn_cm
(residual_and_jac_cm / dogleg_cm): everything is unrolled elementwise
over the lane axis (pure VPU; no matmuls, no transposes), and the 8x8
Newton solve is a row-equilibrated Gauss-Jordan with an unrolled
partial-pivot search (no vector argmax, which Mosaic handles poorly on
the sublane axis).

Currently implemented for the power-law Voce kinetics (the f32
throughput path; MTSDD solves run pure-f64 where Pallas has no f64
support and the XLA path is used).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU builds of jax as well
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

from ..models import evptn_cm as cm

DEFAULT_TILE = 512


# ---------------------------------------------------------------------------
# kernel-local math (CM layout, no transposes)
# ---------------------------------------------------------------------------


def _voce_gdots_slope_cm(kin, taus, g):
    """CM-native power-law slip rates + d|gd|/dtau.

    Mirrors kinetics.VocePL.gdots_slope exactly (f32 exp cap and linear
    continuation included) for taus (S, N), g (N,) hardness (CRSS).
    """
    # python-float constants: kin fields are numpy f64 scalars (unpacked
    # from the props array) and would silently promote the f32 kernel
    # math to f64, which Mosaic cannot lower
    xn = float(1.0 / kin.xm)
    gdot0 = float(kin.gdot0)
    cap = 80.0 if taus.dtype == jnp.float64 else 25.0
    tau_abs = jnp.abs(taus)
    ratio = tau_abs / g[None]
    big = ratio > 1e-10
    ratio_safe = jnp.where(big, ratio, 1.0)
    log_gdot = xn * jnp.log(ratio_safe)
    capped = jnp.minimum(log_gdot, cap)
    over = jnp.maximum(log_gdot - cap, 0.0)
    mag_cap = gdot0 * jnp.exp(capped)
    mag = mag_cap * (1.0 + over)
    gd = jnp.where(big, mag, 0.0)
    slope_mag = jnp.where(log_gdot < cap, xn * mag, xn * mag_cap)
    slope = jnp.where(big, slope_mag / jnp.where(big, tau_abs, 1.0), 0.0)
    return jnp.sign(taus) * gd, slope


def _mv_T_cm(A, x):
    """(k, i, N) "transposed" matvec: out_i = sum_k A[k, i] x[k]."""
    K, I = A.shape[0], A.shape[1]
    rows = []
    for i in range(I):
        acc = A[0, i] * x[0]
        for k in range(1, K):
            acc = acc + A[k, i] * x[k]
        rows.append(acc)
    return jnp.stack(rows)


def _solve8_cm(A, b):
    """Row-equilibrated Gauss-Jordan solve, unrolled partial pivoting.

    A (n, n, N), b (n, N).  Same semantics as evptn_cm.solve_dense_cm_eq
    but the pivot-row search is a static unrolled compare chain instead
    of a masked argmax (lane-axis only; Mosaic-friendly).
    """
    n = A.shape[0]
    tiny = 1e-300 if A.dtype == jnp.float64 else 1e-37
    rmax = jnp.max(jnp.abs(A), axis=1)  # (n, N)
    rs = 1.0 / jnp.maximum(rmax, tiny)
    # augmented rows as a python list of (n+1, N)-row lists
    M = [[A[i, j] * rs[i] for j in range(n)] + [b[i] * rs[i]]
         for i in range(n)]
    m = n + 1
    for col in range(n):
        # unrolled partial-pivot search over rows >= col
        best = jnp.abs(M[col][col])
        piv = jnp.zeros_like(best, dtype=jnp.int32) + col
        for row in range(col + 1, n):
            v = jnp.abs(M[row][col])
            take = v > best
            best = jnp.where(take, v, best)
            piv = jnp.where(take, row, piv)
        # build the pivot row by masked accumulation, then swap
        pivrow = []
        for j in range(col, m):
            acc = jnp.where(piv == col, M[col][j], 0.0)
            for row in range(col + 1, n):
                acc = acc + jnp.where(piv == row, M[row][j], 0.0)
            pivrow.append(acc)
        oldcol = [M[col][j] for j in range(col, m)]
        for row in range(col + 1, n):
            is_p = piv == row
            for jj, j in enumerate(range(col, m)):
                M[row][j] = jnp.where(is_p, oldcol[jj], M[row][j])
        pivval = pivrow[0]
        pinv = 1.0 / jnp.where(jnp.abs(pivval) > tiny, pivval, tiny)
        prow = [p * pinv for p in pivrow]
        for row in range(n):
            if row == col:
                for jj, j in enumerate(range(col, m)):
                    M[row][j] = prow[jj]
            else:
                f = M[row][col]
                for jj, j in enumerate(range(col, m)):
                    M[row][j] = M[row][j] - f * prow[jj]
    return jnp.stack([M[i][n] for i in range(n)])


def _residual_and_jac_voce_cm(kin, C, P, Q, x, g, dt, Dsm, w_sm, e_n, q_n):
    """(r (8, N), J (8, 8, N)); evptn_cm.residual_and_jac_cm specialized
    to the CM-native Voce kinetics (g (N,) CRSS) so no transposes occur
    inside the kernel."""
    dtype = x.dtype
    e_end, xi = x[:5], x[5:]
    q_end = cm.quat_multiply_cm(q_n, cm.expmap_to_quat_cm(xi))
    R = cm.quat_to_rmat_cm(q_end)
    Dlat = cm.rot_T_mat_rot_cm(R, Dsm)
    d_lat = cm.mat_to_vecd_cm(Dlat)
    w_lat = _mv_T_cm(R, w_sm)  # R^T w

    PC = P @ C  # (S, 5) numpy
    taus = cm.const_mm_cm(PC, e_end)
    gd, slope = _voce_gdots_slope_cm(kin, taus, g)
    dp = cm.const_mm_cm(P.T, gd)
    wp = cm.const_mm_cm(Q.T, gd)

    dtb = dt[None]
    r_e = e_end - e_n + dtb * (dp - d_lat)
    r_xi = xi - dtb * (w_lat - wp)
    r = jnp.concatenate([r_e, r_xi], axis=0)

    # identity contributions are added entrywise (a captured jnp.eye
    # constant is not allowed inside a pallas kernel body)
    S = P.shape[0]
    W_P = np.einsum("sk,sl->kls", P, PC).reshape(25, S)
    W_Q = np.einsum("sk,sl->kls", Q, PC).reshape(15, S)
    kP = cm.const_mm_cm(W_P, slope)  # (25, N)
    kQ = cm.const_mm_cm(W_Q, slope)  # (15, N)
    J_ee = jnp.stack([jnp.stack([
        dt * kP[5 * i + j] + (1.0 if i == j else 0.0)
        for j in range(5)]) for i in range(5)])
    J_xe = jnp.stack([jnp.stack([
        dt * kQ[5 * i + j] for j in range(5)]) for i in range(3)])

    ddlat_cols = []
    for k in range(3):
        Kk = cm._EPS[:, k, :]
        dDk = cm.const_mm_r_cm(Dlat, Kk) - cm.const_mm_cm(Kk, Dlat)
        ddlat_cols.append(cm.mat_to_vecd_cm(dDk))
    ddlat_dxi = jnp.stack(ddlat_cols, axis=1)  # (5, 3, N)
    dwlat = cm.const_mm_cm(
        cm._EPS.transpose(0, 2, 1).reshape(9, 3), w_lat)  # (9, N)

    J_exi = -dtb[None] * ddlat_dxi
    J_xxi = jnp.stack([jnp.stack([
        -dt * dwlat[3 * i + j] + (1.0 if i == j else 0.0)
        for j in range(3)]) for i in range(3)])
    Jtop = jnp.concatenate([J_ee, J_exi], axis=1)
    Jbot = jnp.concatenate([J_xe, J_xxi], axis=1)
    return r, jnp.concatenate([Jtop, Jbot], axis=0)


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _norm0(v):
    return jnp.sqrt(jnp.sum(v * v, axis=0))


def _dogleg_kernel(kin, C, P, Q, tol, max_iter,
                   d_ref, w_ref, e_ref, q_ref, g_ref, dts_ref, x0_ref,
                   act_ref, x_out, j_out, ok_out, it_out):
    dtype = x0_ref.dtype
    tiny = float(jnp.finfo(dtype).tiny)

    d_vecd = d_ref[:]
    Dsm = cm.vecd_to_mat_cm(d_vecd)
    w_sm = w_ref[:]
    e_n = e_ref[:]
    q_n = q_ref[:]
    g = g_ref[0]  # (N,) CRSS
    dts = dts_ref[0]  # (N,) per-point substep dt
    active = act_ref[0] > 0

    def rj(x):
        return _residual_and_jac_voce_cm(kin, C, P, Q, x, g, dts, Dsm,
                                         w_sm, e_n, q_n)

    x0 = x0_ref[:]
    r0, J0 = rj(x0)
    done0 = jnp.logical_or(_norm0(r0) < tol, jnp.logical_not(active))

    # NOTE: no jnp.all/jnp.any and no integer-sum reductions in the
    # kernel — Mosaic lowers bool/scalar reductions through proxies that
    # re-trace at LOWERING time under the ambient x64 setting, where
    # jnp.sum(int32) promotes to int64 and reduce_and builds f64
    # scalars, neither of which Mosaic can lower.  f32 accumulation
    # stays f32 regardless of x64.
    def _all_lanes(b):
        return jnp.sum(jnp.logical_not(b).astype(jnp.float32)) == 0.0

    def _all0(b):  # jnp.all(b, axis=0)
        return jnp.sum(jnp.logical_not(b).astype(jnp.float32),
                       axis=0) == 0.0

    # The while carry holds only f32 vectors + the i32 trip counter:
    # bool (i1) and int vectors in an scf.while carry fail Mosaic's
    # layout legalization ("failed to legalize operation 'scf.yield'").
    def cond(state):
        _, _, _, _, it, doneF, _ = state
        return jnp.logical_and(it < max_iter,
                               jnp.sum(1.0 - doneF) > 0.0)

    def body(state):
        x, r, J, delta, it, doneF, iters = state
        done = doneF > 0.5
        p_newton = -_solve8_cm(J, r)
        p_newton = jnp.where(
            _all0(jnp.isfinite(p_newton))[None], p_newton,
            jnp.zeros_like(p_newton))
        pn_norm = _norm0(p_newton)

        g_vec = _mv_T_cm(J, r)  # J^T r
        Jg = cm.mv_cm(J, g_vec)
        gnorm2 = jnp.sum(g_vec * g_vec, axis=0)
        denom = jnp.sum(Jg * Jg, axis=0)
        alpha = gnorm2 / jnp.maximum(denom, tiny)
        p_cauchy = -alpha[None] * g_vec
        pc_norm = _norm0(p_cauchy)

        use_newton = pn_norm <= delta
        d = p_newton - p_cauchy
        a = jnp.sum(d * d, axis=0)
        b = 2.0 * jnp.sum(p_cauchy * d, axis=0)
        c = jnp.sum(p_cauchy * p_cauchy, axis=0) - delta * delta
        disc = jnp.maximum(b * b - 4.0 * a * c, 0.0)
        beta = (-b + jnp.sqrt(disc)) / jnp.maximum(2.0 * a, tiny)
        beta = jnp.clip(beta, 0.0, 1.0)
        p_dog = p_cauchy + beta[None] * d
        p_desc = -(delta / jnp.maximum(_norm0(g_vec), tiny))[None] * g_vec
        p_tr = jnp.where((pc_norm >= delta)[None], p_desc, p_dog)
        p = jnp.where(use_newton[None], p_newton, p_tr)

        x_trial = x + p
        r_trial, J_trial = rj(x_trial)
        phi = 0.5 * jnp.sum(r * r, axis=0)
        phi_trial = 0.5 * jnp.sum(r_trial * r_trial, axis=0)
        lin = r + cm.mv_cm(J, p)
        pred = phi - 0.5 * jnp.sum(lin * lin, axis=0)
        rho = (phi - phi_trial) / jnp.maximum(pred, tiny)
        finite = _all0(jnp.isfinite(r_trial))
        accept = jnp.logical_and(finite, rho > 1e-4)
        step_lane = jnp.logical_and(accept, jnp.logical_not(done))

        x_new = jnp.where(step_lane[None], x_trial, x)
        r_new = jnp.where(step_lane[None], r_trial, r)
        J_new = jnp.where(step_lane[None, None], J_trial, J)

        p_norm = _norm0(p)
        grow = jnp.logical_and(rho > 0.8, p_norm > 0.9 * delta)
        shrink = jnp.logical_or(jnp.logical_not(finite), rho < 0.25)
        very_bad = jnp.logical_or(jnp.logical_not(finite), rho < 0.0)
        factor = jnp.where(very_bad, 0.1, 0.25)
        delta_new = jnp.where(grow, jnp.minimum(2.0 * delta, 1e4), delta)
        delta_new = jnp.where(shrink, jnp.maximum(factor * p_norm, 1e-12),
                              delta_new)
        delta_new = jnp.where(done, delta, delta_new)

        done_new = jnp.logical_or(done, _norm0(r_new) < tol)
        iters_new = iters + (1.0 - doneF)
        return (x_new, r_new, J_new, delta_new, it + 1,
                done_new.astype(jnp.float32), iters_new)

    N = x0.shape[-1]
    state0 = (x0, r0, J0, jnp.ones((N,), dtype),
              jnp.asarray(0, jnp.int32), done0.astype(jnp.float32),
              jnp.zeros((N,), jnp.float32))
    x, r, J, _, _, doneF, iters = jax.lax.while_loop(cond, body, state0)

    x_out[:] = x
    j_out[:] = J
    ok_out[:] = (doneF > 0.5)[None].astype(jnp.int32)
    it_out[:] = iters[None].astype(jnp.int32)


# ---------------------------------------------------------------------------
# host wrapper
# ---------------------------------------------------------------------------


def _is_tpu_backend():
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _dogleg_pallas_call(kin, C, P, Q, d_vecd, w_sm, e_n, q_n, g, dts, x0,
                        active, tol, max_iter, tile, interpret):
    N = x0.shape[-1]
    npad = (-N) % tile
    dtype = x0.dtype

    def pad(a, fill=0.0):
        if npad == 0:
            return a
        width = [(0, 0)] * (a.ndim - 1) + [(0, npad)]
        return jnp.pad(a, width, constant_values=fill)

    d_p = pad(d_vecd)
    w_p = pad(w_sm)
    e_p = pad(e_n)
    q_p = pad(q_n)
    # identity quat + unit strength in the padding keeps the padded
    # lanes' residuals finite (they are masked out via active anyway)
    if npad:
        q_p = q_p.at[0, N:].set(1.0)
    g_p = pad(g[None], fill=1.0)
    dts_p = pad(dts[None], fill=1.0)
    x0_p = pad(x0)
    act_p = pad(active[None].astype(jnp.int32), fill=0)

    Np = N + npad
    grid = (Np // tile,)

    def spec(c):
        return pl.BlockSpec((c, tile), lambda i: (0, i))

    def spec3(c0, c1):
        return pl.BlockSpec((c0, c1, tile), lambda i: (0, 0, i))

    kernel = partial(_dogleg_kernel, kin, C, P, Q, tol, max_iter)
    # Trace the kernel body with x64 OFF: under x64, python scalar
    # literals (the 0.0/1.0 in every jnp.where) enter the jaxpr as weak
    # f64[] constants, which Mosaic refuses to lower ("Only arrays with
    # 32-bit element types can be converted to scalars").  All operands
    # are explicit f32/int32, so disabling x64 only affects literals.
    with jax.enable_x64(False):
        x, J, ok, iters = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[spec(5), spec(3), spec(5), spec(4), spec(1), spec(1),
                      spec(8), spec(1)],
            out_specs=[spec(8), spec3(8, 8), spec(1), spec(1)],
            out_shape=[
                jax.ShapeDtypeStruct((8, Np), dtype),
                jax.ShapeDtypeStruct((8, 8, Np), dtype),
                jax.ShapeDtypeStruct((1, Np), jnp.int32),
                jax.ShapeDtypeStruct((1, Np), jnp.int32),
            ],
            interpret=interpret,
        )(d_p, w_p, e_p, q_p, g_p, dts_p, x0_p, act_p)
    return (x[:, :N], J[:, :, :N], ok[0, :N] > 0, iters[0, :N])


def dogleg_pallas(model, x0, h, dts, d_vecd, w_sm, e_n, q_n, active,
                  tol, max_iter, tile=DEFAULT_TILE, interpret=None):
    """Pallas-backed drop-in for the f32 stage of evptn_cm's dogleg.

    x0 (8, N) initial guess; h (nh, N) hardness; dts (N,) per-point dt;
    d_vecd (5, N) sample-frame deviatoric rate; w_sm (3, N) spin; e_n,
    q_n begin-of-substep state; active (N,) lane mask.
    Returns (x, converged, iters, rnorm_placeholder, J_final) matching
    dogleg_cm's contract (rnorm is not recomputed; callers use ok).
    """
    kin = model.kinetics
    if not hasattr(kin, "xm"):
        raise NotImplementedError(
            "dogleg_pallas implements the power-law Voce kinetics (the "
            "f32 throughput path); MTSDD runs pure-f64 via the XLA path")
    if interpret is None:
        interpret = not _is_tpu_backend()
    import os
    tile = int(os.environ.get("EXACONSTIT_PALLAS_TILE", tile))
    if interpret:
        # interpreter-mode (CPU tests): small tiles keep the padded-lane
        # python evaluation cost bounded
        tile = min(tile, 128)
    C = np.asarray(model.elast.C_dev)
    P = np.asarray(model.slip.P)
    Q = np.asarray(model.slip.Q)
    g = h[0]  # VocePL: scalar CRSS per point
    x, J, ok, iters = _dogleg_pallas_call(
        kin, C, P, Q, d_vecd, w_sm, e_n, q_n, g, dts, x0, active,
        float(tol), int(max_iter), int(tile), bool(interpret))
    return x, ok, iters, None, J
