"""Geometric-multigrid preconditioner (solvers/gmg.py).

The reference carries BoomerAMG because Jacobi-PCG iteration counts grow
with refinement (src/system_driver.cpp:116-150); our analog is a
Chebyshev-smoothed V-cycle on the structured voxel hierarchy.  Tests:
transfer-operator adjointness, the Galerkin (RAP) identity, and a full
Newton solve on the production path matching the Jacobi-preconditioned
solve with fewer Krylov iterations.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from exaconstit_tpu.solvers import gmg


def test_prolong_restrict_adjoint():
    rng = np.random.default_rng(0)
    grid = (4, 6, 2)
    nnf = 5 * 7 * 3
    nnc = 3 * 4 * 2
    c = jnp.asarray(rng.normal(size=(3, nnc)))
    f = jnp.asarray(rng.normal(size=(3, nnf)))
    pc = gmg._prolong(c, grid)
    rf = gmg._restrict(f, grid)
    np.testing.assert_allclose(float(jnp.vdot(pc, f)),
                               float(jnp.vdot(c, rf)), rtol=1e-12)


def test_rap_is_galerkin():
    """A_c == P^T A_f P on random symmetric element blocks."""
    rng = np.random.default_rng(1)
    grid = (4, 4, 4)
    meta = gmg.GMGMeta.__new__(gmg.GMGMeta)
    meta.grids = [(4, 4, 4), (2, 2, 2)]
    meta.nlevels = 2
    meta.conns = [None, gmg._grid_conn(2, 2, 2)]
    meta.wd = gmg._dof_weights()
    nnf, nnc = 125, 27
    conn_f = gmg._grid_conn(*grid)
    B = rng.normal(size=(conn_f.shape[0], 24, 24))
    K = jnp.asarray(np.einsum("eab,ecb->eac", B, B)).transpose(1, 2, 0)
    ess_f = jnp.zeros(3 * nnf, bool)
    ess_c = jnp.zeros(3 * nnc, bool)
    xc = jnp.asarray(rng.normal(size=3 * nnc))
    kc = gmg._rap(K, grid, meta.wd)
    y1 = gmg._ea_matvec(kc, jnp.asarray(meta.conns[1]),
                        xc.reshape(3, nnc), ess_c).reshape(-1)
    xf = gmg._prolong(xc.reshape(3, nnc), grid)
    yf = gmg._ea_matvec(K, jnp.asarray(conn_f), xf, ess_f).reshape(3, nnf)
    y2 = gmg._restrict(yf, grid).reshape(-1)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("n", [8])
def test_gmg_newton_matches_jacobi(n, monkeypatch, tmp_path):
    """Full production newton_solve: GMG-PCG == Jacobi-PCG solution,
    with fewer Krylov iterations per NR iteration."""
    import sys
    REPO = __file__.rsplit("/tests/", 1)[0]
    sys.path.insert(0, REPO)
    from __graft_entry__ import _tiny_problem

    # force a 2-level hierarchy at this tiny size
    monkeypatch.setattr(gmg, "_COARSE_DOFS", 900)

    def solve(precond):
        monkeypatch.setenv("EXACONSTIT_PRECOND", precond)
        system, v0, x0, state, ess = _tiny_problem([n, n, n])
        v, stress, st2, conv, nit, norm = system.newton_solve(
            v0, x0, state, 0.01, ess, verbose=False)
        assert conv
        return (np.asarray(v), np.asarray(stress), nit,
                list(system.last_newton_stats["krylov_iters"]))

    v_j, s_j, nit_j, k_j = solve("jacobi")
    v_g, s_g, nit_g, k_g = solve("gmg")

    scale = np.abs(s_j).max()
    assert np.abs(s_g - s_j).max() / scale < 1e-8
    assert np.abs(v_g - v_j).max() / max(np.abs(v_j).max(), 1e-30) < 1e-6
    # the V-cycle must actually cut the iteration count
    assert sum(k_g) < 0.5 * sum(k_j), (k_g, k_j)
