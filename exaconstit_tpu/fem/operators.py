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


def assemble_ea_gradient(el_x, dshape, qwts, c6, dt):
    """Per-element stiffness matrices (nelems, nen*3, nen*3).

    Layout: dof index = a * 3 + i (node-major, component-minor).
    """
    d_pa = assemble_pa_gradient(el_x, dshape, qwts, c6, dt)
    k = jnp.einsum("qas,eqiskt,qbt->eaibk", dshape, d_pa, dshape)
    ne, nen = k.shape[0], k.shape[1]
    return k.reshape(ne, nen * 3, nen * 3)


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


def element_volumes(el_x, dshape, qwts):
    J = jacobians(el_x, dshape)
    return jnp.einsum("eq,q->e", det_3x3(J), qwts)


def quad_point_volumes(el_x, dshape, qwts):
    """detJ * w at each quadrature point (nelems, nqpts)."""
    J = jacobians(el_x, dshape)
    return det_3x3(J) * qwts[None, :]
