"""FE-core tests.

Includes the analog of the reference's gradient-operator unit test
(test/grad_test.cpp): impose the linear field
u = (2x+3y+4z, 4x+2y+3z, 3x+4y+2z) and verify grad_calc reproduces the
constant gradient at every quadrature point, on both straight and curved
(perturbed-node) meshes and orders 1-3.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from exaconstit_tpu.fem.geometry import (adjugate_3x3, det_3x3, grad_calc,
                                         jacobians)
from exaconstit_tpu.fem.reference import ref_element
from exaconstit_tpu.fem.space import FESpace
from exaconstit_tpu.mesh.voxel import make_cartesian_mesh

GRAD = np.array([[2.0, 3.0, 4.0], [4.0, 2.0, 3.0], [3.0, 4.0, 2.0]])


def linear_field(x):
    return x @ GRAD.T


@pytest.mark.parametrize("order", [1, 2, 3])
@pytest.mark.parametrize("curved", [False, True])
def test_grad_linear_field(order, curved):
    mesh = make_cartesian_mesh([2, 2, 2], [1.0, 1.0, 1.0], order=order)
    coords = mesh.coords.copy()
    if curved:
        rng = np.random.default_rng(42)
        interior = np.all((coords > 1e-12) & (coords < 1 - 1e-12), axis=1)
        coords[interior] += 0.05 * rng.uniform(-1, 1, coords[interior].shape)
    fes = FESpace.create(mesh)
    tvec = jnp.asarray(coords)
    el_x = fes.gather(tvec)
    J = jacobians(el_x, jnp.asarray(fes.ref.dshape))
    v = jnp.asarray(linear_field(coords))
    el_v = fes.gather(v)
    L = grad_calc(el_v, jnp.asarray(fes.ref.dshape), J)
    np.testing.assert_allclose(np.asarray(L),
                               np.broadcast_to(GRAD, L.shape), atol=1e-12)


def test_jacobian_det_adj_identity():
    mesh = make_cartesian_mesh([3, 2, 1], [3.0, 2.0, 1.0], order=1)
    fes = FESpace.create(mesh)
    el_x = fes.gather(jnp.asarray(mesh.coords))
    J = jacobians(el_x, jnp.asarray(fes.ref.dshape))
    det = det_3x3(J)
    adj = adjugate_3x3(J)
    # uniform voxels of size 1 -> J = I, det = 1
    np.testing.assert_allclose(np.asarray(det), 1.0, atol=1e-14)
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("eqij,eqjk->eqik", J, adj)),
        np.broadcast_to(np.eye(3), J.shape), atol=1e-13)


def test_volume_partition_of_unity():
    mesh = make_cartesian_mesh([5, 5, 5], [1.0, 1.0, 1.0], order=1,
                               ref_levels=1)
    fes = FESpace.create(mesh)
    assert fes.num_elems == 1000
    el_x = fes.gather(jnp.asarray(mesh.coords))
    J = jacobians(el_x, jnp.asarray(fes.ref.dshape))
    vol = jnp.sum(det_3x3(J) * jnp.asarray(fes.ref.qwts)[None, :])
    assert abs(float(vol) - 1.0) < 1e-12


def test_scatter_gather_transpose():
    mesh = make_cartesian_mesh([3, 3, 3], [1.0, 1.0, 1.0], order=2)
    fes = FESpace.create(mesh)
    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.normal(size=(fes.num_nodes, 3)))
    e = jnp.asarray(rng.normal(size=(fes.num_elems, fes.nnodes_per_elem, 3)))
    lhs = float(jnp.vdot(fes.gather(t), e))
    rhs = float(jnp.vdot(t, fes.scatter_add(e)))
    assert abs(lhs - rhs) < 1e-10 * max(1.0, abs(lhs))


def test_grain_map_refinement_inheritance():
    gm = np.arange(1, 9)  # 2x2x2 coarse grains
    mesh = make_cartesian_mesh([2, 2, 2], [1.0] * 3, grain_map=gm,
                               ref_levels=1)
    # 4x4x4 fine elements; element (i,j,k) -> grain of (i//2, j//2, k//2)
    attr = mesh.elem_attr.reshape(4, 4, 4)  # z, y, x (x fastest)
    for k in range(4):
        for j in range(4):
            for i in range(4):
                expected = gm[(i // 2) + 2 * ((j // 2) + 2 * (k // 2))]
                assert attr[k, j, i] == expected


def test_bdr_node_sets():
    mesh = make_cartesian_mesh([2, 2, 2], [1.0] * 3, order=1)
    c = mesh.coords
    assert np.all(c[mesh.bdr_nodes[1]][:, 2] == 0.0)  # bottom z=0
    assert np.all(c[mesh.bdr_nodes[2]][:, 0] == 0.0)  # left x=0
    assert np.all(c[mesh.bdr_nodes[3]][:, 1] == 0.0)  # front y=0
    assert np.all(c[mesh.bdr_nodes[4]][:, 2] == 1.0)  # top
    assert np.all(c[mesh.bdr_nodes[5]][:, 0] == 1.0)  # right
    assert np.all(c[mesh.bdr_nodes[6]][:, 1] == 1.0)  # back
    assert len(mesh.bdr_nodes[1]) == 9
