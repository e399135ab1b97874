"""Matrix-free mechanics operator: residual action and Jacobian actions.

TPU-native redesign of the reference's integrator + operator-extension
stack (src/mechanics_integrators.cpp, src/mechanics_operator_ext.cpp):

* residual (internal force): for Cauchy stress sigma at quadrature points,
    F[a, i] = sum_q  dN_a/dx_j  sigma_ji  detJ w
  evaluated as one einsum with adj(J) (dN/dx = dshape @ adj / detJ), cf.
  ExaNLFIntegrator::AssembleElementVector / AssemblePA+AddMultPA
  (mechanics_integrators.cpp:31-93, 160-314, 518-557).

* Jacobian action: with the 6x6 consistent tangent C (engineering shear
  convention) expanded to the un-symmetrized 4th-order C4
  (ExaModel::TransformMatGradTo4D, mechanics_model.cpp:949-1060), the
  bilinear form is
    K(v, u) = sum_q (w dt / detJ) (dshape_a adj)_j C4[i,j,k,l] (dshape_b adj)_l
  Two backends:
    - PA: precompute D[e,q,i,s,k,t] = adj_sj C4[i,j,k,l] adj_tl (w dt/detJ),
      apply as two small contractions per point
      (cf. AssembleGradPA/AddMultGradPA, mechanics_integrators.cpp:321-622);
    - EA: contract once more with the shape gradients into per-element
      (ndof*3)^2 matrices and apply as a batched matmul — MXU-friendly and
      the preferred path for low-order elements
      (cf. AssembleEA, mechanics_integrators.cpp:753-1017).

* diagonal (for Jacobi preconditioning): the (a,i)==(b,k) entries of EA
  (cf. AssembleGradDiagonalPA, mechanics_integrators.cpp:625-748).

All functions are pure; element-batched arrays shard on axis 0.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .geometry import adjugate_3x3, det_3x3, jacobians

# Voigt index pairs in svec order [11, 22, 33, 23, 13, 12]
_VOIGT = np.zeros((3, 3), dtype=int)
_VOIGT[0, 0], _VOIGT[1, 1], _VOIGT[2, 2] = 0, 1, 2
_VOIGT[1, 2] = _VOIGT[2, 1] = 3
_VOIGT[0, 2] = _VOIGT[2, 0] = 4
_VOIGT[0, 1] = _VOIGT[1, 0] = 5


def svec_to_mat33(stress):
    """(..., 6) svec -> (..., 3, 3) full symmetric tensor."""
    return stress[..., _VOIGT]


def c6_to_c4(c6):
    """(..., 6, 6) -> unsymmetrized (..., 3,3,3,3).

    C4[i,j,k,l] = C6[voigt(i,j), voigt(k,l)]: contraction against a full
    velocity gradient reproduces the engineering-shear convention, matching
    TransformMatGradTo4D (mechanics_model.cpp:949-1060).
    """
    return c6[..., _VOIGT[:, :, None, None], _VOIGT[None, None, :, :]]


def residual_force(el_x, dshape, qwts, stress_svec):
    """Internal nodal forces per element (E-vector).

    el_x:        (nelems, nen, 3) current coordinates
    dshape:      (nqpts, nen, 3) reference shape gradients
    qwts:        (nqpts,)
    stress_svec: (nelems, nqpts, 6)
    returns      (nelems, nen, 3)
    """
    J = jacobians(el_x, dshape)
    adj = adjugate_3x3(J)
    sig = svec_to_mat33(stress_svec)
    # F[a,i] = w * dshape[q,a,s] adj[s,j] sig[j,i]
    return jnp.einsum("q,qas,eqsj,eqji->eai", qwts, dshape, adj, sig)


def assemble_pa_gradient(el_x, dshape, qwts, c6, dt):
    """Precompute the PA 6-index D tensor (nelems, nqpts, 3,3,3,3)."""
    J = jacobians(el_x, dshape)
    adj = adjugate_3x3(J)
    det = det_3x3(J)
    c4 = c6_to_c4(c6)
    scale = (qwts[None, :] * dt) / det  # (nelems, nqpts)
    return jnp.einsum("eq,eqsj,eqijkl,eqtl->eqiskt", scale, adj, c4, adj)


def apply_pa_gradient(d_pa, dshape, el_u):
    """y = K u using the PA D tensor.

    d_pa: (nelems, nqpts, 3,3,3,3) from assemble_pa_gradient
    el_u: (nelems, nen, 3)
    returns (nelems, nen, 3)
    """
    h = jnp.einsum("ebk,qbt->eqkt", el_u, dshape)
    t = jnp.einsum("eqiskt,eqkt->eqis", d_pa, h)
    return jnp.einsum("qas,eqis->eai", dshape, t)


def _b_matrices(dndx):
    """Standard B matrices (ne, nq, 6, nen*3): svec rows, engineering
    shear, node-major dofs (GenerateGradMatrix convention,
    mechanics_model.cpp:776-838)."""
    ne, nq, nen, _ = dndx.shape
    B = jnp.zeros((ne, nq, 6, nen, 3), dtype=dndx.dtype)
    dx, dy, dz = dndx[..., 0], dndx[..., 1], dndx[..., 2]
    B = B.at[:, :, 0, :, 0].set(dx)
    B = B.at[:, :, 1, :, 1].set(dy)
    B = B.at[:, :, 2, :, 2].set(dz)
    B = B.at[:, :, 3, :, 1].set(dz)
    B = B.at[:, :, 3, :, 2].set(dy)
    B = B.at[:, :, 4, :, 0].set(dz)
    B = B.at[:, :, 4, :, 2].set(dx)
    B = B.at[:, :, 5, :, 0].set(dy)
    B = B.at[:, :, 5, :, 1].set(dx)
    return B.reshape(ne, nq, 6, nen * 3)


def assemble_ea_gradient(el_x, dshape, qwts, c6, dt):
    """Per-element stiffness matrices (nelems, nen*3, nen*3).

    Layout: dof index = a * 3 + i (node-major, component-minor).
    Built as batched B^T (C dt w) B matmuls — MXU-friendly and avoids the
    6-index adj*C4*adj intermediates that blow up HBM at production sizes.
    """
    dndx, wts = _dndx_and_wts(el_x, dshape, qwts)
    B = _b_matrices(dndx)
    cb = jnp.einsum("eqij,eqjb->eqib", c6, B)
    return jnp.einsum("eq,eqia,eqib->eab", wts * dt, B, cb)


def apply_ea_gradient(k_ea, el_u):
    """Batched matvec with per-element stiffness (MXU path)."""
    ne, nen, _ = el_u.shape
    y = jnp.einsum("eij,ej->ei", k_ea, el_u.reshape(ne, nen * 3))
    return y.reshape(ne, nen, 3)


def ea_diagonal(k_ea, nen):
    """Per-element diagonal (nelems, nen, 3) from EA matrices."""
    ne = k_ea.shape[0]
    d = jnp.diagonal(k_ea, axis1=1, axis2=2)
    return d.reshape(ne, nen, 3)


def pa_diagonal(el_x, dshape, qwts, c6, dt):
    """Assembled-diagonal without forming EA matrices.

    diag[e,a,i] = sum_q (w dt/detJ) b_s b_t C4[i,s,i,t],
    b_s = dshape[q,a,:] @ adj[:,s]  (cf. AssembleGradDiagonalPA,
    mechanics_integrators.cpp:625-748).
    """
    J = jacobians(el_x, dshape)
    adj = adjugate_3x3(J)
    det = det_3x3(J)
    c4 = c6_to_c4(c6)
    scale = (qwts[None, :] * dt) / det
    b = jnp.einsum("qar,eqrs->eqas", dshape, adj)  # dN_a/dx_s * detJ
    return jnp.einsum("eq,eqas,eqisit,eqat->eai", scale, b, c4, b)


# ----------------------------------------------------------------------------
# BBar (mean-dilatation) integration, cf. ICExaNLFIntegrator
# (mechanics_integrators.cpp:1021-2040; B-bar construction
# ExaModel::GenerateGradBarMatrix, mechanics_model.cpp:840-878).
# The volumetric part of the B operator is replaced by its element average;
# the reference has no PA gradient for BBar (falls back), so EA is the
# gradient backend here as well.
# ----------------------------------------------------------------------------

def _dndx_and_wts(el_x, dshape, qwts):
    J = jacobians(el_x, dshape)
    adj = adjugate_3x3(J)
    det = det_3x3(J)
    dndx = jnp.einsum("qas,eqsj->eqaj", dshape, adj) / det[..., None, None]
    wts = det * qwts[None, :]
    return dndx, wts


def bbar_mean_gradient(el_x, dshape, qwts):
    """Element-averaged shape gradients eDS (nelems, nen, 3)."""
    dndx, wts = _dndx_and_wts(el_x, dshape, qwts)
    vol = jnp.sum(wts, axis=1)
    return jnp.einsum("eq,eqaj->eaj", wts, dndx) / vol[:, None, None]


def residual_force_bbar(el_x, dshape, qwts, stress_svec):
    """Internal forces with the B-bar operator:
    f[a,i] = sum_q w detJ [ dN_a/dx_j sig_ji
                            + (eDS_ai - DS_ai)/3 tr(sig) ]."""
    dndx, wts = _dndx_and_wts(el_x, dshape, qwts)
    vol = jnp.sum(wts, axis=1)
    eds = jnp.einsum("eq,eqaj->eaj", wts, dndx) / vol[:, None, None]
    sig = svec_to_mat33(stress_svec)
    f_std = jnp.einsum("eq,eqaj,eqji->eai", wts, dndx, sig)
    tr = stress_svec[..., 0] + stress_svec[..., 1] + stress_svec[..., 2]
    dcorr = eds[:, None] - dndx  # (ne, nq, nen, 3)
    f_cor = jnp.einsum("eq,eq,eqai->eai", wts, tr / 3.0, dcorr)
    return f_std + f_cor


def _bbar_matrices(dndx, eds):
    """B-bar matrices (ne, nq, 6, nen*3), svec rows w/ engineering shear,
    dofs node-major."""
    ne, nq, nen, _ = dndx.shape
    b1 = (eds[:, None] - dndx) / 3.0  # (ne, nq, nen, 3)
    B = jnp.zeros((ne, nq, 6, nen, 3), dtype=dndx.dtype)
    dx, dy, dz = dndx[..., 0], dndx[..., 1], dndx[..., 2]
    c0, c1, c2 = b1[..., 0], b1[..., 1], b1[..., 2]
    B = B.at[:, :, 0, :, 0].set(dx + c0)
    B = B.at[:, :, 0, :, 1].set(c1)
    B = B.at[:, :, 0, :, 2].set(c2)
    B = B.at[:, :, 1, :, 0].set(c0)
    B = B.at[:, :, 1, :, 1].set(dy + c1)
    B = B.at[:, :, 1, :, 2].set(c2)
    B = B.at[:, :, 2, :, 0].set(c0)
    B = B.at[:, :, 2, :, 1].set(c1)
    B = B.at[:, :, 2, :, 2].set(dz + c2)
    B = B.at[:, :, 3, :, 1].set(dz)
    B = B.at[:, :, 3, :, 2].set(dy)
    B = B.at[:, :, 4, :, 0].set(dz)
    B = B.at[:, :, 4, :, 2].set(dx)
    B = B.at[:, :, 5, :, 0].set(dy)
    B = B.at[:, :, 5, :, 1].set(dx)
    return B.reshape(ne, nq, 6, nen * 3)


def assemble_ea_gradient_bbar(el_x, dshape, qwts, c6, dt):
    """Per-element B-bar stiffness (nelems, nen*3, nen*3)."""
    dndx, wts = _dndx_and_wts(el_x, dshape, qwts)
    vol = jnp.sum(wts, axis=1)
    eds = jnp.einsum("eq,eqaj->eaj", wts, dndx) / vol[:, None, None]
    B = _bbar_matrices(dndx, eds)
    cb = jnp.einsum("eqij,eqjb->eqib", c6, B)
    return jnp.einsum("eq,eqia,eqib->eab", wts * dt, B, cb)


def bbar_vgrad_correction(el_v, dndx, wts):
    """Mean-dilatation velocity gradient: replace the volumetric part of
    L at each qpt by the element average (for the material update)."""
    L = jnp.einsum("enk,eqnj->eqkj", el_v, dndx)
    tr_q = jnp.trace(L, axis1=-2, axis2=-1)
    vol = jnp.sum(wts, axis=1)
    tr_avg = jnp.einsum("eq,eq->e", wts, tr_q) / vol
    corr = (tr_avg[:, None] - tr_q) / 3.0
    return L + corr[..., None, None] * jnp.eye(3, dtype=L.dtype)


# ----------------------------------------------------------------------------
# Component-major variants (batch axes last; see fem/geometry.py note).
# Used by the driver's EA/FULL hot path on TPU: zero tile padding and
# lane-parallel small contractions.  Layouts:
#   el_x_cm / el_u_cm   (3, nen, ne)
#   stress_cm           (6, nq, ne)
#   c6_cm               (6, 6, nq, ne)
#   k_cm                (ndof, ndof, ne), dof = node*3 + comp
# ----------------------------------------------------------------------------

from .geometry import adjugate_3x3_cm, det_3x3_cm, jacobians_cm  # noqa: E402


def svec_to_mat33_cm(stress_cm):
    """(6, ...) svec -> (3, 3, ...) full symmetric tensor."""
    return stress_cm[_VOIGT]


def residual_force_cm(el_x_cm, dshape, qwts, stress_cm):
    """Internal nodal forces per element, component-major.

    returns (3, nen, ne): f[i, a, e].
    """
    J = jacobians_cm(el_x_cm, dshape)
    adj = adjugate_3x3_cm(J)
    sig = svec_to_mat33_cm(stress_cm)  # (3, 3, nq, ne)
    return jnp.einsum("q,qas,sjqe,jiqe->iae", qwts, dshape, adj, sig)


def _dndx_and_wts_cm(el_x_cm, dshape, qwts):
    J = jacobians_cm(el_x_cm, dshape)
    adj = adjugate_3x3_cm(J)
    det = det_3x3_cm(J)  # (nq, ne)
    dndx = jnp.einsum("qns,sjqe->njqe", dshape, adj) / det[None, None]
    return dndx, det * qwts[:, None]


def assemble_ea_gradient_cm(el_x_cm, dshape, qwts, c6_cm, dt):
    """Per-element stiffness (ndof, ndof, ne), component-major.

    Same math as assemble_ea_gradient (B^T (C dt w) B), computed via the
    nodal-block formula K[(a,i),(b,k)] = sum_q w dN_a/dx_j C4[i,j,k,l]
    dN_b/dx_l with the 3x3x3x3 C4 unrolled from the engineering-shear
    6x6 — no B matrices, no 5-D dot_general operands: every temp is
    (nen, *, nq, ne) with the big axes minor (XLA otherwise materializes
    transposed copies of the (6, 24, nq, ne) B whose (6, 24) tail pads
    7x on TPU tiles and OOMs production meshes).
    """
    dndx, wts = _dndx_and_wts_cm(el_x_cm, dshape, qwts)  # (nen,3,q,e), (q,e)
    w = (wts * dt)[None, None]  # (1, 1, nq, ne)
    nen = dndx.shape[0]
    ne = dndx.shape[3]
    dtype = dndx.dtype

    # C4[i, j, k, l] = c6[voigt(i,j), voigt(k,l)] (engineering shear:
    # the un-symmetrized expansion, matching c6_to_c4)
    blocks = []
    for i in range(3):
        row = []
        for k in range(3):
            # T[a, l] = sum_j dndx[a, j] * c6[voigt(i,j), voigt(k,l)]
            t_cols = []
            for ell in range(3):
                acc = 0.0
                for j in range(3):
                    acc = acc + dndx[:, j] * c6_cm[_VOIGT[i, j],
                                                   _VOIGT[k, ell]]
                t_cols.append(acc)  # (nen, nq, ne)
            T = jnp.stack(t_cols, axis=1)  # (nen, 3, nq, ne)
            # K_ik[a, b] = sum_{q, l} w T[a, l] dndx[b, l]
            k_ik = jnp.einsum("alqe,blqe->abe", w * T, dndx)
            row.append(k_ik)  # (nen, nen, ne)
        blocks.append(row)
    k9 = jnp.stack([jnp.stack(r) for r in blocks])  # (3, 3, nen, nen, ne)
    k_cm = jnp.transpose(k9, (2, 0, 3, 1, 4))  # (nen, 3, nen, 3, ne)
    return k_cm.reshape(nen * 3, nen * 3, ne)


def apply_ea_gradient_cm(k_cm, el_u_cm):
    """Batched matvec y[i, a, e] from CM stiffness; lane-parallel."""
    nen = el_u_cm.shape[1]
    u = el_u_cm.transpose(1, 0, 2).reshape(nen * 3, -1)  # (ndof, ne)
    y = jnp.einsum("abe,be->ae", k_cm, u)
    return y.reshape(nen, 3, -1).transpose(1, 0, 2)


def ea_diagonal_cm(k_cm, nen):
    """Per-element diagonal (3, nen, ne) from CM stiffness."""
    d = jnp.einsum("aae->ae", k_cm)
    return d.reshape(nen, 3, -1).transpose(1, 0, 2)


def quad_point_volumes_cm(el_x_cm, dshape, qwts):
    """detJ * w at each quadrature point (nq, ne), component-major."""
    J = jacobians_cm(el_x_cm, dshape)
    return det_3x3_cm(J) * qwts[:, None]


def element_volumes(el_x, dshape, qwts):
    J = jacobians(el_x, dshape)
    return jnp.einsum("eq,q->e", det_3x3(J), qwts)


def quad_point_volumes(el_x, dshape, qwts):
    """detJ * w at each quadrature point (nelems, nqpts)."""
    J = jacobians(el_x, dshape)
    return det_3x3(J) * qwts[None, :]
