"""Matrix-free Krylov solvers as jit-compiled fixed-point loops.

Equivalents of the MFEM CGSolver / MINRESSolver / GMRESSolver used by the
reference (constructed in src/system_driver.cpp:152-187), with the same
convergence semantics:

* PCG follows MFEM's CG: convergence on the preconditioned inner product
  nom = (z, r), stopping when nom <= max(rel_tol^2 * nom0, abs_tol^2).
* MINRES follows MFEM's preconditioned MINRES (norm of the preconditioned
  residual).
* GMRES is restarted GMRES(m) with modified Gram-Schmidt, right... left
  preconditioning like MFEM (residual norm in the preconditioned space).

`matvec` and `precond` are traced callables (close over operator data);
wrap the call in jit at the call site.  All reductions are jnp dots, which
become XLA collectives automatically under shard_map/pjit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def pcg(matvec, precond, b, rel_tol, abs_tol, max_iter):
    """MFEM-semantics preconditioned conjugate gradients; solves A x = b.

    Returns (x, iters, converged).
    """
    x = jnp.zeros_like(b)
    r = b  # x0 = 0
    z = precond(r)
    d = z
    nom0 = jnp.vdot(z, r)
    nom = nom0
    r0 = jnp.maximum(nom0 * rel_tol * rel_tol,
                     jnp.asarray(abs_tol * abs_tol, b.dtype))

    def cond(state):
        x, r, z, d, nom, it, done = state
        return jnp.logical_and(it < max_iter, jnp.logical_not(done))

    def body(state):
        x, r, z, d, nom, it, done = state
        ad = matvec(d)
        den = jnp.vdot(d, ad)
        alpha = nom / den
        x = x + alpha * d
        r = r - alpha * ad
        z = precond(r)
        betanom = jnp.vdot(r, z)
        done = betanom <= r0
        beta = betanom / nom
        d = z + beta * d
        return (x, r, z, d, betanom, it + 1, done)

    state = (x, r, z, d, nom, jnp.asarray(0), nom <= r0)
    x, r, z, d, nom, it, done = jax.lax.while_loop(cond, body, state)
    return x, it, done


def minres(matvec, precond, b, rel_tol, abs_tol, max_iter):
    """Preconditioned MINRES (MFEM-style).  Returns (x, iters, converged)."""
    x = jnp.zeros_like(b)
    v1 = b
    u1 = precond(v1)
    eta = jnp.sqrt(jnp.vdot(u1, v1))
    gamma = eta
    norm_goal = jnp.maximum(rel_tol * eta, jnp.asarray(abs_tol, b.dtype))

    w0 = jnp.zeros_like(b)
    w1 = jnp.zeros_like(b)
    v0 = jnp.zeros_like(b)
    c0 = c1 = jnp.asarray(1.0, b.dtype)
    s0 = s1 = jnp.asarray(0.0, b.dtype)

    def cond(st):
        return jnp.logical_and(st["it"] < max_iter,
                               jnp.logical_not(st["done"]))

    def body(st):
        x, v0, v1, u1, w0, w1 = st["x"], st["v0"], st["v1"], st["u1"], \
            st["w0"], st["w1"]
        gamma, eta = st["gamma"], st["eta"]
        c0, c1, s0, s1 = st["c0"], st["c1"], st["s0"], st["s1"]
        z = u1 / gamma
        av = matvec(z)
        alpha = jnp.vdot(z, av) / gamma
        v2 = av - (alpha / gamma) * v1 - (gamma / st["gamma_prev"]) * v0
        u2 = precond(v2)
        gamma2 = jnp.sqrt(jnp.vdot(u2, v2))
        delta = c1 * alpha - c0 * s1 * gamma
        rho3 = s0 * gamma
        rho2 = s1 * alpha + c0 * c1 * gamma
        rho1 = jnp.sqrt(delta * delta + gamma2 * gamma2)
        c2 = delta / rho1
        s2 = gamma2 / rho1
        w2 = (z - rho3 * w0 - rho2 * w1) / rho1
        x = x + c2 * eta * w2
        eta = -s2 * eta
        done = jnp.abs(eta) <= norm_goal
        return dict(x=x, v0=v1, v1=v2, u1=u2, w0=w1, w1=w2,
                    gamma_prev=gamma, gamma=gamma2, eta=eta,
                    c0=c1, c1=c2, s0=s1, s1=s2, it=st["it"] + 1, done=done)

    st = dict(x=x, v0=v0, v1=v1, u1=u1, w0=w0, w1=w1,
              gamma_prev=jnp.asarray(1.0, b.dtype), gamma=gamma, eta=eta,
              c0=c0, c1=c1, s0=s0, s1=s1, it=jnp.asarray(0),
              done=jnp.abs(eta) <= norm_goal)
    st = jax.lax.while_loop(cond, body, st)
    return st["x"], st["it"], st["done"]


def gmres(matvec, precond, b, rel_tol, abs_tol, max_iter, restart=50):
    """Left-preconditioned restarted GMRES(m), MFEM-style convergence.

    Static restart length; one lax.while_loop over restarts with a
    fori_loop Arnoldi inside.  Returns (x, iters, converged).
    """
    n = b.shape[0]
    m = restart
    dtype = b.dtype

    def norm(v):
        return jnp.sqrt(jnp.vdot(v, v))

    r = precond(b)
    beta0 = norm(r)
    goal = jnp.maximum(rel_tol * beta0, jnp.asarray(abs_tol, dtype))

    def outer_cond(st):
        return jnp.logical_and(st["it"] < max_iter,
                               jnp.logical_not(st["done"]))

    def outer_body(st):
        x = st["x"]
        r = precond(b - matvec(x))
        beta = norm(r)
        V = jnp.zeros((m + 1, n), dtype)
        V = V.at[0].set(r / jnp.maximum(beta, 1e-300))
        H = jnp.zeros((m + 1, m), dtype)
        cs = jnp.zeros(m, dtype)
        sn = jnp.zeros(m, dtype)
        g = jnp.zeros(m + 1, dtype).at[0].set(beta)

        def arnoldi(j, carry):
            V, H, cs, sn, g, k_eff, done_in = carry
            active = jnp.logical_not(done_in)
            w = precond(matvec(V[j]))

            # modified Gram-Schmidt against V[0..j]
            def mgs(i, wh):
                w, hcol = wh
                use = i <= j
                hij = jnp.where(use, jnp.vdot(V[i], w), 0.0)
                return (w - hij * V[i], hcol.at[i].set(hij))

            w, hcol = jax.lax.fori_loop(0, m, mgs,
                                        (w, jnp.zeros(m + 1, dtype)))
            hj1 = norm(w)
            V = V.at[j + 1].set(jnp.where(
                active, w / jnp.maximum(hj1, 1e-300), V[j + 1]))
            hcol = hcol.at[j + 1].set(hj1)

            # apply previous Givens rotations to the new column
            def giv(i, hc):
                use = i < j
                t0 = jnp.where(use, cs[i] * hc[i] + sn[i] * hc[i + 1], hc[i])
                t1 = jnp.where(use, -sn[i] * hc[i] + cs[i] * hc[i + 1],
                               hc[i + 1])
                return hc.at[i].set(t0).at[i + 1].set(t1)

            hcol = jax.lax.fori_loop(0, m, giv, hcol)
            denom = jnp.sqrt(hcol[j] ** 2 + hcol[j + 1] ** 2)
            cj = hcol[j] / jnp.maximum(denom, 1e-300)
            sj = hcol[j + 1] / jnp.maximum(denom, 1e-300)
            hcol = hcol.at[j].set(denom).at[j + 1].set(0.0)
            g_j1 = -sj * g[j]
            g = g.at[j + 1].set(jnp.where(active, g_j1, g[j + 1]))
            g = g.at[j].set(jnp.where(active, cj * g[j], g[j]))
            H = H.at[:, j].set(jnp.where(active, hcol, H[:, j]))
            cs = cs.at[j].set(jnp.where(active, cj, cs[j]))
            sn = sn.at[j].set(jnp.where(active, sj, sn[j]))
            k_eff = jnp.where(active, j + 1, k_eff)
            done_out = jnp.logical_or(done_in,
                                      jnp.logical_and(active,
                                                      jnp.abs(g_j1) <= goal))
            return (V, H, cs, sn, g, k_eff, done_out)

        V, H, cs, sn, g, k_eff, done = jax.lax.fori_loop(
            0, m, arnoldi, (V, H, cs, sn, g, jnp.asarray(0), st["done"]))

        # masked back substitution on the k_eff x k_eff triangular system
        y = jnp.zeros(m, dtype)

        def backsub(jj, y):
            j = m - 1 - jj
            active = j < k_eff
            s = g[j] - jnp.dot(H[j, :], y)
            yj = jnp.where(active, s / jnp.where(active, H[j, j], 1.0), 0.0)
            return y.at[j].set(yj)

        y = jax.lax.fori_loop(0, m, backsub, y)
        x = x + jnp.einsum("k,kn->n", y, V[:m])
        return dict(x=x, it=st["it"] + k_eff, done=done)

    st = dict(x=jnp.zeros_like(b), it=jnp.asarray(0), done=beta0 <= goal)
    st = jax.lax.while_loop(outer_cond, outer_body, st)
    return st["x"], st["it"], st["done"]
