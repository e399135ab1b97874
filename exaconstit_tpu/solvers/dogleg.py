"""Batched trust-region dogleg Newton solver for small dense systems.

TPU-native equivalent of the SNLS `SNLSTrDlDenseG` solver that ExaCMech
uses for the per-quadrature-point implicit crystal-plasticity update
(reference: SURVEY.md section 2.2; the solve happens inside
`getResponseECM`, src/mechanics_ecmech.cpp:176-186).

Written point-wise and designed to be `jax.vmap`-ed over millions of
quadrature points: the `lax.while_loop` vectorizes into a masked batched
iteration that runs until every lane converges (or hits max_iter).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .linalg_small import solve_dense


def dogleg_solve(resid_jac_fn, x0, tol=1e-10, max_iter=100, delta_init=1.0,
                 delta_min=1e-12, delta_max=1e4, return_jac=False):
    """Solve R(x) = 0 for one point; vmap for batches.

    resid_jac_fn: x -> (r, J) with r: (n,), J: (n, n)
    Returns (x, converged(bool), num_iters, final_norm[, J_final]).
    """
    n = x0.shape[0]

    def norm(v):
        return jnp.sqrt(jnp.sum(v * v))

    tiny = float(jnp.finfo(x0.dtype).tiny)
    r0, J0 = resid_jac_fn(x0)

    def cond(state):
        x, r, J, delta, it, done = state
        return jnp.logical_and(it < max_iter, jnp.logical_not(done))

    def body(state):
        x, r, J, delta, it, done = state
        rnorm = norm(r)

        # Newton step (explicit small-dense solve: TPU LU lacks f64)
        p_newton = -solve_dense(J, r)
        p_newton = jnp.where(jnp.all(jnp.isfinite(p_newton)), p_newton,
                             jnp.zeros_like(p_newton))
        pn_norm = norm(p_newton)

        # Cauchy (steepest-descent) step
        g = J.T @ r
        Jg = J @ g
        gnorm2 = jnp.sum(g * g)
        denom = jnp.sum(Jg * Jg)
        alpha = gnorm2 / jnp.maximum(denom, tiny)
        p_cauchy = -alpha * g
        pc_norm = norm(p_cauchy)

        use_newton = pn_norm <= delta

        # dogleg interpolation p = pc + beta (pn - pc) hitting |p| = delta
        d = p_newton - p_cauchy
        a = jnp.sum(d * d)
        b = 2.0 * jnp.sum(p_cauchy * d)
        c = jnp.sum(p_cauchy * p_cauchy) - delta * delta
        disc = jnp.maximum(b * b - 4.0 * a * c, 0.0)
        beta = (-b + jnp.sqrt(disc)) / jnp.maximum(2.0 * a, tiny)
        beta = jnp.clip(beta, 0.0, 1.0)
        p_dog = p_cauchy + beta * d
        # if even the Cauchy point is outside the radius, take scaled descent
        p_desc = -(delta / jnp.maximum(norm(g), tiny)) * g
        p_tr = jnp.where(pc_norm >= delta, p_desc, p_dog)
        p = jnp.where(use_newton, p_newton, p_tr)

        x_trial = x + p
        r_trial, J_trial = resid_jac_fn(x_trial)
        phi = 0.5 * jnp.sum(r * r)
        phi_trial = 0.5 * jnp.sum(r_trial * r_trial)
        lin = r + J @ p
        pred = phi - 0.5 * jnp.sum(lin * lin)
        rho = (phi - phi_trial) / jnp.maximum(pred, tiny)
        finite = jnp.all(jnp.isfinite(r_trial))
        accept = jnp.logical_and(finite, rho > 1e-4)

        x_new = jnp.where(accept, x_trial, x)
        r_new = jnp.where(accept, r_trial, r)
        J_new = jnp.where(accept, J_trial, J)

        p_norm = norm(p)
        grow = jnp.logical_and(rho > 0.8, p_norm > 0.9 * delta)
        shrink = jnp.logical_or(jnp.logical_not(finite), rho < 0.25)
        very_bad = jnp.logical_or(jnp.logical_not(finite), rho < 0.0)
        factor = jnp.where(very_bad, 0.1, 0.25)
        delta_new = jnp.where(grow, jnp.minimum(2.0 * delta, delta_max), delta)
        delta_new = jnp.where(shrink,
                              jnp.maximum(factor * p_norm, delta_min),
                              delta_new)

        done_new = norm(r_new) < tol
        return (x_new, r_new, J_new, delta_new, it + 1, done_new)

    done0 = norm(r0) < tol
    x, r, J, delta, it, done = jax.lax.while_loop(
        cond, body, (x0, r0, J0, jnp.asarray(delta_init, x0.dtype),
                     jnp.asarray(0), done0))
    if return_jac:
        return x, done, it, norm(r), J
    return x, done, it, norm(r)
