"""Batched geometric factors and field gradients.

These are the TPU-native equivalents of MFEM's GeometricFactors and
exaconstit::kernel::grad_calc (src/mechanics_kernels.cpp:7-78): everything
is one batched einsum over (elements, quadrature points) instead of
per-element loops.

Because the formulation is updated-Lagrangian on a moving mesh, the
Jacobians are recomputed from the *current* nodal coordinates every Newton
iteration (reference: NonlinearMechOperator::Setup →
SetupJacobianTerms, src/mechanics_operator.cpp:350-391) — here that is just
part of the jitted residual computation and fuses with everything else.
"""

from __future__ import annotations

import jax.numpy as jnp


def jacobians(el_coords, dshape):
    """Element Jacobians at quadrature points.

    el_coords: (nelems, nnodes, 3) current nodal coordinates (E-vector)
    dshape:    (nqpts, nnodes, 3) reference shape gradients
    returns J: (nelems, nqpts, 3, 3) with J[i,j] = dx_i/dxi_j
    """
    return jnp.einsum("enI,qnJ->eqIJ", el_coords, dshape)


def det_3x3(J):
    return (
        J[..., 0, 0] * (J[..., 1, 1] * J[..., 2, 2] - J[..., 2, 1] * J[..., 1, 2])
        - J[..., 1, 0] * (J[..., 0, 1] * J[..., 2, 2] - J[..., 2, 1] * J[..., 0, 2])
        + J[..., 2, 0] * (J[..., 0, 1] * J[..., 1, 2] - J[..., 1, 1] * J[..., 0, 2])
    )


def adjugate_3x3(J):
    """adj(J) with J @ adj(J) = det(J) I (matches the reference's unrolled
    adjugate, e.g. src/mechanics_integrators.cpp:449-457)."""
    a00 = J[..., 1, 1] * J[..., 2, 2] - J[..., 1, 2] * J[..., 2, 1]
    a01 = J[..., 2, 1] * J[..., 0, 2] - J[..., 0, 1] * J[..., 2, 2]
    a02 = J[..., 0, 1] * J[..., 1, 2] - J[..., 1, 1] * J[..., 0, 2]
    a10 = J[..., 2, 0] * J[..., 1, 2] - J[..., 1, 0] * J[..., 2, 2]
    a11 = J[..., 0, 0] * J[..., 2, 2] - J[..., 0, 2] * J[..., 2, 0]
    a12 = J[..., 1, 0] * J[..., 0, 2] - J[..., 0, 0] * J[..., 1, 2]
    a20 = J[..., 1, 0] * J[..., 2, 1] - J[..., 2, 0] * J[..., 1, 1]
    a21 = J[..., 2, 0] * J[..., 0, 1] - J[..., 0, 0] * J[..., 2, 1]
    a22 = J[..., 0, 0] * J[..., 1, 1] - J[..., 0, 1] * J[..., 1, 0]
    r0 = jnp.stack([a00, a01, a02], axis=-1)
    r1 = jnp.stack([a10, a11, a12], axis=-1)
    r2 = jnp.stack([a20, a21, a22], axis=-1)
    return jnp.stack([r0, r1, r2], axis=-2)


def grad_calc(el_field, dshape, J):
    """Spatial gradient of a nodal vector field at quadrature points.

    Equivalent of exaconstit::kernel::grad_calc: for velocity v this yields
    L with L[i,j] = dv_i/dx_j.

    el_field: (nelems, nnodes, 3)
    dshape:   (nqpts, nnodes, 3)
    J:        (nelems, nqpts, 3, 3)
    returns:  (nelems, nqpts, 3, 3)
    """
    adj = adjugate_3x3(J)
    detj = det_3x3(J)
    # dN_a/dx_j = dN_a/dxi_s * adj(J)[s,j] / det
    # L_ij = sum_a v[a,i] dN_a/dx_j
    g = jnp.einsum("enI,qns,eqsJ->eqIJ", el_field, dshape, adj)
    return g / detj[..., None, None]


# ---------------------------------------------------------------------------
# Component-major variants (batch axes LAST).
#
# On TPU the minor-most two axes of every materialized array tile onto
# (8, 128) vector registers, so point-major layouts with tiny trailing
# dims — J (ne, nq, 3, 3), B (ne, nq, 6, 24) — pad 5-100x in HBM and
# collapse VPU utilization (measured: the 32^3 Newton step OOMs a 16 GB
# chip purely on padded temps).  The CM variants keep (.., nq, ne) as
# the LAST axes everywhere: lane = element, sublane = quadrature point,
# zero padding, and every small contraction is a constant-coefficient
# multiply-add over (nq, ne) panels.
# ---------------------------------------------------------------------------


def jacobians_cm(el_x_cm, dshape):
    """Element Jacobians, component-major.

    el_x_cm: (3, nnodes, nelems) current nodal coordinates
    dshape:  (nqpts, nnodes, 3) reference shape gradients (tiny constant)
    returns J_cm: (3, 3, nqpts, nelems), J[i, j] = dx_i/dxi_j
    """
    return jnp.einsum("ine,qnj->ijqe", el_x_cm, dshape)


def det_3x3_cm(J):
    """det of (3, 3, ...) component-major matrices."""
    return (
        J[0, 0] * (J[1, 1] * J[2, 2] - J[2, 1] * J[1, 2])
        - J[1, 0] * (J[0, 1] * J[2, 2] - J[2, 1] * J[0, 2])
        + J[2, 0] * (J[0, 1] * J[1, 2] - J[1, 1] * J[0, 2])
    )


def adjugate_3x3_cm(J):
    """adj(J) for (3, 3, ...) component-major matrices."""
    rows = [
        [J[1, 1] * J[2, 2] - J[1, 2] * J[2, 1],
         J[2, 1] * J[0, 2] - J[0, 1] * J[2, 2],
         J[0, 1] * J[1, 2] - J[1, 1] * J[0, 2]],
        [J[2, 0] * J[1, 2] - J[1, 0] * J[2, 2],
         J[0, 0] * J[2, 2] - J[0, 2] * J[2, 0],
         J[1, 0] * J[0, 2] - J[0, 0] * J[1, 2]],
        [J[1, 0] * J[2, 1] - J[2, 0] * J[1, 1],
         J[2, 0] * J[0, 1] - J[0, 0] * J[2, 1],
         J[0, 0] * J[1, 1] - J[0, 1] * J[1, 0]],
    ]
    return jnp.stack([jnp.stack(r) for r in rows])


def grad_calc_cm(el_field_cm, dshape, adj, detj):
    """Spatial gradient of a nodal field, component-major.

    el_field_cm: (3, nnodes, nelems)
    adj:  (3, 3, nqpts, nelems) adjugate of J (jacobians_cm)
    detj: (nqpts, nelems)
    returns L_cm: (3, 3, nqpts, nelems) with L[i, j] = df_i/dx_j
    """
    g = jnp.einsum("ine,qns,sjqe->ijqe", el_field_cm, dshape, adj)
    return g / detj[None, None]
