"""Operator-equivalence tests (reference tier 1, test/mechanics_test.cpp).

The reference asserts FA == PA == EA actions with a mocked material tangent
(all-ones or cubic-symmetry C) on a curved mesh.  Here the reference
(full-assembly) implementation is an independent numpy B^T C B / B^T sigma
evaluation; PA and EA must match it to near machine precision, and PA must
equal EA exactly in exact arithmetic.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from exaconstit_tpu.fem import operators as ops
from exaconstit_tpu.fem.geometry import adjugate_3x3, det_3x3, jacobians
from exaconstit_tpu.fem.space import FESpace
from exaconstit_tpu.mesh.voxel import make_cartesian_mesh


def curved_fes(order):
    mesh = make_cartesian_mesh([2, 2, 2], [1.0] * 3, order=order)
    rng = np.random.default_rng(11)
    coords = mesh.coords.copy()
    interior = np.all((coords > 1e-12) & (coords < 1 - 1e-12), axis=1)
    coords[interior] += 0.04 * rng.uniform(-1, 1, coords[interior].shape)
    mesh.coords[:] = coords
    return FESpace.create(mesh)


def numpy_b_matrix(dndx):
    """B (6, 3*nen) in svec order w/ engineering shear, node-major dofs.

    Mirrors ExaModel::GenerateGradMatrix (mechanics_model.cpp:776-838) but
    with our (node, component) dof interleaving.
    """
    nen = dndx.shape[0]
    B = np.zeros((6, 3 * nen))
    for a in range(nen):
        dx, dy, dz = dndx[a]
        B[0, 3 * a + 0] = dx
        B[1, 3 * a + 1] = dy
        B[2, 3 * a + 2] = dz
        B[3, 3 * a + 1] = dz
        B[3, 3 * a + 2] = dy
        B[4, 3 * a + 0] = dz
        B[4, 3 * a + 2] = dx
        B[5, 3 * a + 0] = dy
        B[5, 3 * a + 1] = dx
    return B


def reference_element_matrices(fes, el_x, c6, dt):
    """Dense per-element stiffness via numpy B^T C B (the FA reference)."""
    dshape = fes.ref.dshape
    qwts = fes.ref.qwts
    J = np.asarray(jacobians(jnp.asarray(el_x), jnp.asarray(dshape)))
    det = np.asarray(det_3x3(jnp.asarray(J)))
    adj = np.asarray(adjugate_3x3(jnp.asarray(J)))
    ne, nq = J.shape[0], J.shape[1]
    nen = dshape.shape[1]
    K = np.zeros((ne, 3 * nen, 3 * nen))
    for e in range(ne):
        for q in range(nq):
            dndx = dshape[q] @ adj[e, q] / det[e, q]
            B = numpy_b_matrix(dndx)
            K[e] += (B.T @ c6[e, q] @ B) * det[e, q] * qwts[q] * dt
    return K


def mock_c6(ne, nq, kind):
    if kind == "ones":
        return np.ones((ne, nq, 6, 6))
    c = np.zeros((6, 6))
    c[:3, :3] = 110.0
    np.fill_diagonal(c[:3, :3], 250.0)
    c[3, 3] = c[4, 4] = c[5, 5] = 86.0
    return np.tile(c, (ne, nq, 1, 1))


@pytest.mark.parametrize("order", [1, 2, 3])
@pytest.mark.parametrize("kind", ["ones", "cubic"])
def test_pa_ea_fa_equivalence(order, kind):
    fes = curved_fes(order)
    el_x = np.asarray(fes.gather(jnp.asarray(fes.mesh.coords)))
    ne, nq = fes.num_elems, fes.nqpts
    c6 = mock_c6(ne, nq, kind)
    dt = 0.37
    dshape = jnp.asarray(fes.ref.dshape)
    qwts = jnp.asarray(fes.ref.qwts)

    rng = np.random.default_rng(3)
    el_u = jnp.asarray(rng.normal(size=(ne, fes.nnodes_per_elem, 3)))

    d_pa = ops.assemble_pa_gradient(jnp.asarray(el_x), dshape, qwts,
                                    jnp.asarray(c6), dt)
    y_pa = np.asarray(ops.apply_pa_gradient(d_pa, dshape, el_u))

    k_ea = ops.assemble_ea_gradient(jnp.asarray(el_x), dshape, qwts,
                                    jnp.asarray(c6), dt)
    y_ea = np.asarray(ops.apply_ea_gradient(k_ea, el_u))

    # FA reference via dense numpy K (dof layout: node-major)
    K = reference_element_matrices(fes, el_x, c6, dt)
    u_flat = np.asarray(el_u).reshape(ne, -1)
    y_fa = np.einsum("eij,ej->ei", K, u_flat).reshape(y_pa.shape)

    scale = np.abs(y_fa).max()
    assert np.abs(y_pa - y_fa).max() / scale < 1e-13
    assert np.abs(y_ea - y_fa).max() / scale < 1e-13
    assert np.abs(y_pa - y_ea).max() / scale < 1e-13

    # EA diagonal matches dense diagonal
    d_ea = np.asarray(ops.ea_diagonal(k_ea, fes.nnodes_per_elem))
    d_ref = np.einsum("eii->ei", K).reshape(d_ea.shape)
    assert np.abs(d_ea - d_ref).max() / np.abs(d_ref).max() < 1e-13
    # PA diagonal too
    d_pa_diag = np.asarray(ops.pa_diagonal(jnp.asarray(el_x), dshape, qwts,
                                           jnp.asarray(c6), dt))
    assert np.abs(d_pa_diag - d_ref).max() / np.abs(d_ref).max() < 1e-13


def test_pa_ea_equivalence_order6():
    """Order-6 PA == EA cross-check (reference runs orders 3 and 6,
    test/mechanics_test.cpp:54,187; the dense numpy FA reference is too
    slow at order 6, but PA and EA are independent formulations whose
    agreement at 1e-13 on a curved element exercises the same paths)."""
    mesh = make_cartesian_mesh([1, 1, 1], [1.0] * 3, order=6)
    rng = np.random.default_rng(17)
    coords = mesh.coords.copy()
    interior = np.all((coords > 1e-12) & (coords < 1 - 1e-12), axis=1)
    coords[interior] += 0.02 * rng.uniform(-1, 1, coords[interior].shape)
    mesh.coords[:] = coords
    fes = FESpace.create(mesh)
    el_x = np.asarray(fes.gather(jnp.asarray(fes.mesh.coords)))
    ne, nq = fes.num_elems, fes.nqpts
    c6 = mock_c6(ne, nq, "cubic")
    dshape = jnp.asarray(fes.ref.dshape)
    qwts = jnp.asarray(fes.ref.qwts)
    el_u = jnp.asarray(rng.normal(size=(ne, fes.nnodes_per_elem, 3)))

    d_pa = ops.assemble_pa_gradient(jnp.asarray(el_x), dshape, qwts,
                                    jnp.asarray(c6), 0.37)
    y_pa = np.asarray(ops.apply_pa_gradient(d_pa, dshape, el_u))
    k_ea = ops.assemble_ea_gradient(jnp.asarray(el_x), dshape, qwts,
                                    jnp.asarray(c6), 0.37)
    y_ea = np.asarray(ops.apply_ea_gradient(k_ea, el_u))
    scale = np.abs(y_ea).max()
    assert np.abs(y_pa - y_ea).max() / scale < 2e-13


def test_residual_force_vs_numpy():
    fes = curved_fes(1)
    el_x = np.asarray(fes.gather(jnp.asarray(fes.mesh.coords)))
    ne, nq = fes.num_elems, fes.nqpts
    rng = np.random.default_rng(5)
    stress = rng.normal(size=(ne, nq, 6))
    got = np.asarray(ops.residual_force(
        jnp.asarray(el_x), jnp.asarray(fes.ref.dshape),
        jnp.asarray(fes.ref.qwts), jnp.asarray(stress)))

    dshape = fes.ref.dshape
    qwts = fes.ref.qwts
    J = np.asarray(jacobians(jnp.asarray(el_x), jnp.asarray(dshape)))
    det = np.asarray(det_3x3(jnp.asarray(J)))
    adj = np.asarray(adjugate_3x3(jnp.asarray(J)))
    want = np.zeros_like(got)
    for e in range(ne):
        for q in range(nq):
            dndx = dshape[q] @ adj[e, q] / det[e, q]
            s = stress[e, q]
            sig = np.array([[s[0], s[5], s[4]],
                            [s[5], s[1], s[3]],
                            [s[4], s[3], s[2]]])
            want[e] += (dndx @ sig) * det[e, q] * qwts[q]
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-13)


def test_gradient_is_residual_derivative():
    """K == d(residual)/d(u) for a linear-elastic fake material: apply the
    operator pipeline with stress = C:eps(u) and verify K u == r(u)."""
    fes = curved_fes(1)
    tvec = jnp.asarray(fes.mesh.coords)
    el_x = fes.gather(tvec)
    ne, nq = fes.num_elems, fes.nqpts
    c6 = jnp.asarray(mock_c6(ne, nq, "cubic"))
    dshape = jnp.asarray(fes.ref.dshape)
    qwts = jnp.asarray(fes.ref.qwts)
    dt = 1.0

    rng = np.random.default_rng(8)
    u = jnp.asarray(rng.normal(size=(fes.num_nodes, 3)) * 1e-6)
    el_u = fes.gather(u)

    from exaconstit_tpu.fem.geometry import grad_calc
    J = jacobians(el_x, dshape)
    L = grad_calc(el_u, dshape, J)
    eps = 0.5 * (L + jnp.swapaxes(L, -1, -2))
    eps_svec = jnp.stack([eps[..., 0, 0], eps[..., 1, 1], eps[..., 2, 2],
                          2 * eps[..., 1, 2], 2 * eps[..., 0, 2],
                          2 * eps[..., 0, 1]], axis=-1)
    stress = jnp.einsum("eqij,eqj->eqi", c6, eps_svec)
    r = fes.scatter_add(ops.residual_force(el_x, dshape, qwts, stress))

    k_ea = ops.assemble_ea_gradient(el_x, dshape, qwts, c6, dt)
    ku = fes.scatter_add(ops.apply_ea_gradient(k_ea, el_u))
    np.testing.assert_allclose(np.asarray(ku), np.asarray(r), rtol=1e-10,
                               atol=1e-18)


def test_bbar_operators():
    """BBar (mean dilatation): traceless stress gives identical forces;
    gradient is symmetric and is the derivative of the BBar residual for
    a linear material evaluated with BBar-consistent kinematics."""
    fes = curved_fes(1)
    el_x = fes.gather(jnp.asarray(fes.mesh.coords))
    ne, nq = fes.num_elems, fes.nqpts
    dshape = jnp.asarray(fes.ref.dshape)
    qwts = jnp.asarray(fes.ref.qwts)
    rng = np.random.default_rng(9)

    # deviatoric stress -> BBar correction vanishes
    s_dev = rng.normal(size=(ne, nq, 6))
    s_dev[..., :3] -= s_dev[..., :3].mean(axis=-1, keepdims=True)
    f_std = np.asarray(ops.residual_force(el_x, dshape, qwts,
                                          jnp.asarray(s_dev)))
    f_bbar = np.asarray(ops.residual_force_bbar(el_x, dshape, qwts,
                                                jnp.asarray(s_dev)))
    np.testing.assert_allclose(f_bbar, f_std, rtol=1e-12, atol=1e-14)

    c6 = jnp.asarray(mock_c6(ne, nq, "cubic"))
    k = np.asarray(ops.assemble_ea_gradient_bbar(el_x, dshape, qwts, c6,
                                                 0.3))
    np.testing.assert_allclose(k, np.swapaxes(k, 1, 2), atol=1e-10)

    # directional-derivative check: for stress = C : eps_bbar(u), the BBar
    # force equals K_bbar u
    u = jnp.asarray(rng.normal(size=(fes.num_nodes, 3)) * 1e-6)
    el_u = fes.gather(u)
    dndx, wts = ops._dndx_and_wts(el_x, dshape, qwts)
    eds = ops.bbar_mean_gradient(el_x, dshape, qwts)
    B = ops._bbar_matrices(dndx, eds)
    eps_bbar = jnp.einsum("eqia,ea->eqi",
                          B, el_u.reshape(ne, -1))
    stress = jnp.einsum("eqij,eqj->eqi", c6, eps_bbar)
    r = np.asarray(fes.scatter_add(ops.residual_force_bbar(
        el_x, dshape, qwts, stress)))
    ku = np.asarray(fes.scatter_add(ops.apply_ea_gradient(
        ops.assemble_ea_gradient_bbar(el_x, dshape, qwts, c6, 1.0), el_u)))
    np.testing.assert_allclose(ku, r, rtol=1e-9, atol=1e-18)
