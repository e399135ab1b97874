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


def pcg(matvec, precond, b, rel_tol, abs_tol, max_iter, dot=None):
    """MFEM-semantics preconditioned conjugate gradients; solves A x = b.

    ``dot`` overrides the inner product (distributed callers inside
    shard_map pass an owner-masked psum dot).  Returns (x, iters,
    converged, rel_reduction) where rel_reduction is the achieved
    sqrt((z,r)/(z0,r0)) in the convergence-criterion norm — recorded so
    iteration-capped (unconverged) solves are visible as such instead of
    masquerading as convergence counts.
    """
    if dot is None:
        dot = jnp.vdot
    x = jnp.zeros_like(b)
    r = b  # x0 = 0
    z = precond(r)
    d = z
    nom0 = dot(z, r)
    nom = nom0
    r0 = jnp.maximum(nom0 * rel_tol * rel_tol,
                     jnp.asarray(abs_tol * abs_tol, b.dtype))

    def cond(state):
        x, r, z, d, nom, it, done = state
        return jnp.logical_and(it < max_iter, jnp.logical_not(done))

    def body(state):
        x, r, z, d, nom, it, done = state
        ad = matvec(d)
        den = dot(d, ad)
        # breakdown guard (MFEM CGSolver does the same): if the operator
        # is numerically not positive definite at this iterate — which in
        # f32 also happens by underflow of (d, Ad) on tiny right-hand
        # sides — stop without taking the (NaN/inf) step.
        ok = den > 0.0
        alpha = jnp.where(ok, nom / jnp.where(ok, den, 1.0), 0.0)
        x = x + alpha * d
        r = r - alpha * ad
        z = precond(r)
        betanom = dot(r, z)
        done = jnp.logical_or(betanom <= r0, jnp.logical_not(ok))
        beta = jnp.where(ok, betanom / nom, 0.0)
        d = z + beta * d
        return (x, r, z, d, betanom, it + 1, done)

    state = (x, r, z, d, nom, jnp.asarray(0), nom <= r0)
    x, r, z, d, nom, it, done = jax.lax.while_loop(cond, body, state)
    relred = jnp.sqrt(jnp.maximum(nom, 0.0)
                      / jnp.where(nom0 > 0.0, nom0, 1.0))
    return x, it, done, relred


def minres(matvec, precond, b, rel_tol, abs_tol, max_iter):
    """Preconditioned MINRES (Paige-Saunders).

    Convergence on the preconditioned residual norm phibar, like MFEM's
    MINRESSolver.  Returns (x, iters, converged, rel_reduction).
    """
    dtype = b.dtype
    r1 = b  # x0 = 0
    y = precond(r1)
    beta1 = jnp.sqrt(jnp.vdot(r1, y))
    goal = jnp.maximum(rel_tol * beta1, jnp.asarray(abs_tol, dtype))

    st = dict(
        x=jnp.zeros_like(b), r1=r1, r2=r1, y=y,
        oldb=jnp.asarray(0.0, dtype), beta=beta1,
        dbar=jnp.asarray(0.0, dtype), epsln=jnp.asarray(0.0, dtype),
        phibar=beta1, cs=jnp.asarray(-1.0, dtype),
        sn=jnp.asarray(0.0, dtype),
        w=jnp.zeros_like(b), w2=jnp.zeros_like(b),
        it=jnp.asarray(0), done=beta1 <= goal,
    )

    def cond(st):
        return jnp.logical_and(st["it"] < max_iter,
                               jnp.logical_not(st["done"]))

    def body(st):
        v = st["y"] / st["beta"]
        y = matvec(v)
        y = jnp.where(st["it"] >= 1,
                      y - (st["beta"] / jnp.where(st["oldb"] == 0.0, 1.0,
                                                  st["oldb"])) * st["r1"],
                      y)
        alfa = jnp.vdot(v, y)
        y = y - (alfa / st["beta"]) * st["r2"]
        r1, r2 = st["r2"], y
        y = precond(r2)
        oldb, beta = st["beta"], jnp.sqrt(jnp.vdot(r2, y))
        oldeps = st["epsln"]
        delta = st["cs"] * st["dbar"] + st["sn"] * alfa
        gbar = st["sn"] * st["dbar"] - st["cs"] * alfa
        epsln = st["sn"] * beta
        dbar = -st["cs"] * beta
        gamma = jnp.maximum(jnp.sqrt(gbar * gbar + beta * beta), 1e-300)
        cs = gbar / gamma
        sn = beta / gamma
        phi = cs * st["phibar"]
        phibar = sn * st["phibar"]
        w1, w2 = st["w2"], st["w"]
        w = (v - oldeps * w1 - delta * w2) / gamma
        x = st["x"] + phi * w
        return dict(x=x, r1=r1, r2=r2, y=y, oldb=oldb, beta=beta, dbar=dbar,
                    epsln=epsln, phibar=phibar, cs=cs, sn=sn, w=w, w2=w2,
                    it=st["it"] + 1, done=phibar <= goal)

    st = jax.lax.while_loop(cond, body, st)
    relred = st["phibar"] / jnp.where(beta1 > 0.0, beta1, 1.0)
    return st["x"], st["it"], st["done"], relred


def gmres(matvec, precond, b, rel_tol, abs_tol, max_iter, restart=50):
    """Left-preconditioned restarted GMRES(m), MFEM-style convergence.

    Static restart length; one lax.while_loop over restarts with a
    fori_loop Arnoldi inside.  Returns (x, iters, converged,
    rel_reduction).
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
        return dict(x=x, it=st["it"] + k_eff, done=done,
                    res=jnp.abs(g[k_eff]))

    st = dict(x=jnp.zeros_like(b), it=jnp.asarray(0), done=beta0 <= goal,
              res=beta0)
    st = jax.lax.while_loop(outer_cond, outer_body, st)
    relred = st["res"] / jnp.where(beta0 > 0.0, beta0, 1.0)
    return st["x"], st["it"], st["done"], relred


def pcg_refined(matvec, precond, matvec_lo, precond_lo, b, rel_tol, abs_tol,
                max_iter, inner_rel=1e-4, max_rounds=6, dot=None):
    """Mixed-precision PCG: f32 inner solves + f64 iterative refinement.

    TPU f64 is emulated (~10x the f32 op cost), but a Krylov solve only
    needs f64 at the residual-replay level: each round runs plain f32 PCG
    on the current f64 residual (reducing the preconditioned norm by
    ~inner_rel), then recomputes r = b - A x in f64, restoring the
    floating-point floor.  Convergence uses MFEM's CG criterion in f64:
    (z, r) <= max(rel_tol^2 (z0, b), abs_tol^2) — identical semantics to
    ``pcg``, so converged results match the full-f64 solver within the
    requested tolerance.

    matvec/precond: f64; matvec_lo/precond_lo: f32 equivalents.
    Returns (x, total_inner_iters, converged, rel_reduction).
    """
    if dot is None:
        dot = jnp.vdot
    lo = jnp.float32
    z0 = precond(b)
    nom0 = dot(z0, b)
    r0bar = jnp.maximum(nom0 * rel_tol * rel_tol,
                        jnp.asarray(abs_tol * abs_tol, b.dtype))

    def cond(state):
        x, r, nom, it, rounds, done = state
        return jnp.logical_and(rounds < max_rounds,
                               jnp.logical_and(it < max_iter,
                                               jnp.logical_not(done)))

    def body(state):
        x, r, nom, it, rounds, done = state
        budget = max_iter - it
        # Normalize the inner right-hand side: late refinement rounds have
        # ||r|| ~ 1e-8 ||b|| and the f32 PCG recurrences ((z,r), (d,Ad))
        # square that, underflowing f32 to exact zero.  Solving for the
        # direction of r restores the full f32 dynamic range.
        rnorm = jnp.sqrt(dot(r, r))
        scale = jnp.where(rnorm > 0.0, rnorm, 1.0)
        dx, in_it, _, _ = pcg(matvec_lo, precond_lo, (r / scale).astype(lo),
                              inner_rel, 0.0, budget, dot=dot)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        x = x + scale * dx.astype(b.dtype)
        r = b - matvec(x)
        z = precond(r)
        nom = dot(z, r)
        return (x, r, nom, it + in_it, rounds + 1, nom <= r0bar)

    state = (jnp.zeros_like(b), b, nom0, jnp.asarray(0), jnp.asarray(0),
             nom0 <= r0bar)
    x, r, nom, it, rounds, done = jax.lax.while_loop(cond, body, state)
    relred = jnp.sqrt(jnp.maximum(nom, 0.0)
                      / jnp.where(nom0 > 0.0, nom0, 1.0))
    return x, it, done, relred
