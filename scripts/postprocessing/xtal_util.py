"""Crystallographic utilities for the lattice-strain pipeline.

Self-contained equivalents of the pieces of HEXRD + the reference's
scripts/postprocessing/exaconstit_post.py that the lattice-strain
("simulated diffraction") chain needs: symmetry operator sets, quaternion
algebra, crystal-direction construction from Miller indices, and
distance-to-crystallographic-fiber.
"""

from __future__ import annotations

import numpy as np


def quat_prod(q2, q1):
    """Hamilton product q2 * q1 for (..., 4) scalar-first quaternions."""
    a0, a1, a2, a3 = np.moveaxis(q2, -1, 0)
    b0, b1, b2, b3 = np.moveaxis(q1, -1, 0)
    return np.stack([
        a0 * b0 - a1 * b1 - a2 * b2 - a3 * b3,
        a0 * b1 + a1 * b0 + a2 * b3 - a3 * b2,
        a0 * b2 - a1 * b3 + a2 * b0 + a3 * b1,
        a0 * b3 + a1 * b2 - a2 * b1 + a3 * b0,
    ], axis=-1)


def quat_of_angle_axis(angle, axis):
    axis = np.asarray(axis, dtype=float)
    axis = axis / np.linalg.norm(axis)
    return np.concatenate([[np.cos(angle / 2)], np.sin(angle / 2) * axis])


def rmat_of_quat(q):
    """(..., 4) unit quats -> (..., 3, 3) rotation matrices."""
    q = np.asarray(q, dtype=float)
    q0, q1, q2, q3 = np.moveaxis(q, -1, 0)
    qbar = q0 * q0 - (q1 * q1 + q2 * q2 + q3 * q3)
    R = np.empty(q.shape[:-1] + (3, 3))
    R[..., 0, 0] = qbar + 2 * q1 * q1
    R[..., 0, 1] = 2 * (q1 * q2 - q0 * q3)
    R[..., 0, 2] = 2 * (q1 * q3 + q0 * q2)
    R[..., 1, 0] = 2 * (q1 * q2 + q0 * q3)
    R[..., 1, 1] = qbar + 2 * q2 * q2
    R[..., 1, 2] = 2 * (q2 * q3 - q0 * q1)
    R[..., 2, 0] = 2 * (q1 * q3 - q0 * q2)
    R[..., 2, 1] = 2 * (q2 * q3 + q0 * q1)
    R[..., 2, 2] = qbar + 2 * q3 * q3
    return R


def cubic_symmetries():
    """The 24 rotational symmetry quaternions of the cubic lattice."""
    pi = np.pi
    angle_axes = [(0.0, [1, 0, 0])]
    for ax in ([1, 0, 0], [0, 1, 0], [0, 0, 1]):  # 4-fold <100>
        for a in (pi / 2, pi, 3 * pi / 2):
            angle_axes.append((a, ax))
    for ax in ([1, 1, 1], [-1, 1, 1], [1, -1, 1], [-1, -1, 1]):  # 3-fold
        for a in (2 * pi / 3, 4 * pi / 3):
            angle_axes.append((a, ax))
    for ax in ([1, 1, 0], [-1, 1, 0], [1, 0, 1], [1, 0, -1], [0, 1, 1],
               [0, 1, -1]):  # 2-fold <110>
        angle_axes.append((pi, ax))
    return np.stack([quat_of_angle_axis(a, ax) for a, ax in angle_axes])


def hex_symmetries():
    """The 12 rotational symmetry quaternions of the hexagonal lattice."""
    pi = np.pi
    c, s = np.cos(pi / 6), np.sin(pi / 6)
    quats = []
    for k in range(6):  # 6-fold about c
        quats.append(quat_of_angle_axis(k * pi / 3, [0, 0, 1]))
    for k in range(6):  # 2-fold axes in the basal plane
        a = k * pi / 6
        quats.append(quat_of_angle_axis(pi, [np.cos(a), np.sin(a), 0]))
    del c, s
    return np.stack(quats)


def hkl_to_cartesian(hkl, lattice="cubic", lparms=(1.0,)):
    """Unit crystal-frame cartesian direction of the (hkl) plane normal.

    cubic: normal ∝ [h, k, l].  hexagonal (3-index Miller (h k l), a=c
    axes from lparms=(a, c)): reciprocal basis normal.
    """
    h, k, l = (float(v) for v in hkl)
    if lattice == "cubic":
        v = np.array([h, k, l])
    elif lattice == "hexagonal":
        a, c = lparms
        # reciprocal lattice vectors of the hexagonal cell (cartesian,
        # x || a1, z || c)
        astar = 2 * np.pi / a * np.array([1.0, -1.0 / np.sqrt(3.0), 0.0])
        bstar = 2 * np.pi / a * np.array([0.0, 2.0 / np.sqrt(3.0), 0.0])
        cstar = 2 * np.pi / c * np.array([0.0, 0.0, 1.0])
        v = h * astar + k * bstar + l * cstar
    else:
        raise ValueError(f"unsupported lattice {lattice}")
    return v / np.linalg.norm(v)


def distance_to_fiber(c_dir, s_dir, quats, qsym):
    """Angular distance (radians) of each orientation from the
    crystallographic fiber {R : R (S c) || s for some symmetry S}.

    quats: (N, 4) crystal->sample rotations.  The distance is the minimum
    over symmetry operators and +/- c of the angle between R S c and s.
    """
    c = np.asarray(c_dir, dtype=float).reshape(3)
    c = c / np.linalg.norm(c)
    s = np.asarray(s_dir, dtype=float).reshape(3)
    s = s / np.linalg.norm(s)
    Rsym = rmat_of_quat(qsym)  # (M, 3, 3)
    c_equiv = Rsym @ c  # (M, 3)
    R = rmat_of_quat(np.atleast_2d(quats))  # (N, 3, 3)
    cs = np.einsum("nij,mj->nmi", R, c_equiv)  # (N, M, 3)
    cosang = np.abs(np.einsum("nmi,i->nm", cs, s))  # Friedel pair: |.|
    return np.arccos(np.clip(cosang.max(axis=1), -1.0, 1.0))


def ort_symmetries():
    """The 4 rotational symmetry quaternions of the orthorhombic lattice."""
    return np.stack([quat_of_angle_axis(0.0, [1, 0, 0]),
                     quat_of_angle_axis(np.pi, [1, 0, 0]),
                     quat_of_angle_axis(np.pi, [0, 1, 0]),
                     quat_of_angle_axis(np.pi, [0, 0, 1])])


def quat_mean(quats, weights=None):
    """Weighted mean orientation (Markley/Cheng/Crassidis/Oshman):
    the dominant eigenvector of M = sum_k w_k q_k q_k^T."""
    q = np.atleast_2d(np.asarray(quats, dtype=float))
    w = (np.ones(q.shape[0]) if weights is None
         else np.asarray(weights, dtype=float))
    m = np.einsum("k,ki,kj->ij", w / w.sum(), q, q)
    vals, vecs = np.linalg.eigh(m)
    mq = vecs[:, -1]
    return mq if mq[0] >= 0 else -mq


def to_fundamental_region(quats, qsym):
    """Symmetry-reduce crystal->sample quats: for each, the equivalent
    q * s (s in qsym) with the largest positive scalar part (smallest
    rotation angle representative)."""
    q = np.atleast_2d(np.asarray(quats, dtype=float))
    equiv = quat_prod(q[:, None, :], qsym[None, :, :])  # (N, M, 4)
    best = np.argmax(np.abs(equiv[..., 0]), axis=1)
    out = equiv[np.arange(len(q)), best]
    return out * np.sign(out[:, :1])


def misorientation(q_ref, quats, qsym):
    """Misorientation of each quat from q_ref, symmetry-reduced.

    Returns (angles [rad], misorientation quats in the fundamental
    region).  m_k = q_ref^-1 * q_k expressed in the crystal frame.
    """
    qr = np.asarray(q_ref, dtype=float).reshape(4)
    qr_inv = qr * np.array([1.0, -1, -1, -1])
    m = quat_prod(qr_inv[None, :], np.atleast_2d(quats))
    m = to_fundamental_region(m, qsym)
    ang = 2.0 * np.arccos(np.clip(m[:, 0], -1.0, 1.0))
    return ang, m


def misorientation_spread(quats, el_vol, grains, qsym=None):
    """Per-grain intragrain misorientation spread (radians).

    The Barton & Dawson substructure metric (Met. Mat. Trans. A 32A
    (2001) 1967): per grain, take the volume-weighted second moment of
    the rotation vectors w_k = theta_k * n_k of each element's
    misorientation from the grain-mean orientation,
    W = sum_k v_k w_k w_k^T / sum_k v_k, and report sqrt(trace(W)) --
    the volume-weighted RMS misorientation angle.  (The reference's
    misorientationSpread computes the same trace unnormalized; the
    normalized form is resolution-independent.)

    Returns (unique_grain_ids, spread) arrays.
    """
    if qsym is None:
        qsym = cubic_symmetries()
    q = np.asarray(quats, dtype=float).reshape(-1, 4)
    vol = np.asarray(el_vol, dtype=float).reshape(-1)
    gr = np.asarray(grains).reshape(-1)
    ugrains = np.unique(gr)
    spread = np.empty(len(ugrains))
    for n, gid in enumerate(ugrains):
        sel = gr == gid
        qg, wg = q[sel], vol[sel]
        center = quat_mean(to_fundamental_region(qg, qsym), weights=wg)
        ang, m = misorientation(center, qg, qsym)
        # rotation vector w = theta * axis; near theta=0 the
        # vector part already ~ theta/2 * axis, scale safely
        s = np.where(ang > np.finfo(float).eps,
                     ang / np.maximum(np.sin(ang / 2.0), 1e-300), 2.0)
        wvec = m[:, 1:] * s[:, None]
        W = np.einsum("k,ki,kj->ij", wg / wg.sum(), wvec, wvec)
        spread[n] = np.sqrt(np.trace(W))
    return ugrains, spread
