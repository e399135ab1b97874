"""Tensor-notation conventions and conversions.

These conventions mirror the reference's data contracts so that state
layouts, golden outputs, and material parameter files are interchangeable:

* ``svec`` (6): symmetric tensor as ``[a11, a22, a33, a23, a13, a12]``
  (reference: src/mechanics_ecmech.cpp:73-78, src/mechanics_integrators.cpp:77-86).
* ``vecd`` (5): orthonormal deviatoric basis ("t-vector"),
  ``t0=(a11-a22)/sqrt(2), t1=sqrt(3/2)*a33, t2=sqrt(2)*a12, t3=sqrt(2)*a13,
  t4=sqrt(2)*a23`` (inverse map in src/mechanics_ecmech.hpp:343-355 and
  src/system_driver.cpp:854-867).  Norm-preserving: ``|t|^2 = A:A`` for
  deviatoric symmetric A.
* ``wvec`` (3): axial vector of a skew tensor ``[W32, W13, W21]``
  (src/mechanics_ecmech.cpp:65-67).
* ``quat`` (4): unit quaternion ``[q0(scalar), q1, q2, q3]``; the rotation
  matrix convention matches src/mechanics_model.cpp:525-544 (Quat2RMat).

All functions operate on the trailing axis and broadcast over leading axes.
"""

import jax.numpy as jnp
import numpy as np

# python floats (NOT np scalars) so f32 arrays don't get promoted to f64
SQRT2 = float(np.sqrt(2.0))
SQRT3 = float(np.sqrt(3.0))
SQRT6 = float(np.sqrt(6.0))
SQR2I = 1.0 / SQRT2
SQR3I = 1.0 / SQRT3
SQR6I = 1.0 / SQRT6
SQR2B3 = float(np.sqrt(2.0 / 3.0))
SQR3B2 = float(np.sqrt(1.5))

# Orthonormal basis (w.r.t. A:B) for symmetric deviatoric 3x3 tensors, in the
# vecd component order documented above: vecd_k(A) = BASIS_DEV[k] : A.
_B = np.zeros((5, 3, 3))
_B[0, 0, 0] = SQR2I
_B[0, 1, 1] = -SQR2I
_B[1, 0, 0] = -SQR6I
_B[1, 1, 1] = -SQR6I
_B[1, 2, 2] = 2.0 * SQR6I
_B[2, 0, 1] = _B[2, 1, 0] = SQR2I
_B[3, 0, 2] = _B[3, 2, 0] = SQR2I
_B[4, 1, 2] = _B[4, 2, 1] = SQR2I
BASIS_DEV = _B  # (5, 3, 3), numpy


def mat_to_vecd(a):
    """Deviatoric 5-vector of a (possibly non-deviatoric) symmetric tensor."""
    return jnp.einsum("kij,...ij->...k",
                      jnp.asarray(BASIS_DEV, dtype=a.dtype), a)


def vecd_to_mat(t):
    """Symmetric deviatoric 3x3 tensor from its 5-vector."""
    return jnp.einsum("kij,...k->...ij",
                      jnp.asarray(BASIS_DEV, dtype=t.dtype), t)


def svec_to_vecd(s):
    """svec (assumed deviatoric in the normal components) -> vecd.

    Matches ecmech::svecToVecd as used in src/mechanics_ecmech.cpp:81-82.
    """
    return jnp.stack(
        [
            (s[..., 0] - s[..., 1]) * SQR2I,
            SQR3B2 * s[..., 2],
            SQRT2 * s[..., 5],  # 12
            SQRT2 * s[..., 4],  # 13
            SQRT2 * s[..., 3],  # 23
        ],
        axis=-1,
    )


def vecd_to_svec(t):
    """vecd -> deviatoric svec [a11,a22,a33,a23,a13,a12]."""
    t1 = SQR2I * t[..., 0]
    t2 = SQR6I * t[..., 1]
    return jnp.stack(
        [
            t1 - t2,
            -t1 - t2,
            SQR2B3 * t[..., 1],
            SQR2I * t[..., 4],
            SQR2I * t[..., 3],
            SQR2I * t[..., 2],
        ],
        axis=-1,
    )


def mat_to_svec(a):
    """Symmetric part of a 3x3 tensor -> svec."""
    return jnp.stack(
        [
            a[..., 0, 0],
            a[..., 1, 1],
            a[..., 2, 2],
            0.5 * (a[..., 1, 2] + a[..., 2, 1]),
            0.5 * (a[..., 0, 2] + a[..., 2, 0]),
            0.5 * (a[..., 0, 1] + a[..., 1, 0]),
        ],
        axis=-1,
    )


def svec_to_mat(s):
    """svec -> full symmetric 3x3 tensor."""
    z = s[..., 0]
    rows = [
        jnp.stack([s[..., 0], s[..., 5], s[..., 4]], axis=-1),
        jnp.stack([s[..., 5], s[..., 1], s[..., 3]], axis=-1),
        jnp.stack([s[..., 4], s[..., 3], s[..., 2]], axis=-1),
    ]
    del z
    return jnp.stack(rows, axis=-2)


def mat_to_wvec(a):
    """Axial vector [W32, W13, W21] of the skew part of a 3x3 tensor."""
    return jnp.stack(
        [
            0.5 * (a[..., 2, 1] - a[..., 1, 2]),
            0.5 * (a[..., 0, 2] - a[..., 2, 0]),
            0.5 * (a[..., 1, 0] - a[..., 0, 1]),
        ],
        axis=-1,
    )


def wvec_to_mat(w):
    """Skew 3x3 tensor from its axial vector [W32, W13, W21]."""
    zero = jnp.zeros_like(w[..., 0])
    rows = [
        jnp.stack([zero, -w[..., 2], w[..., 1]], axis=-1),
        jnp.stack([w[..., 2], zero, -w[..., 0]], axis=-1),
        jnp.stack([-w[..., 1], w[..., 0], zero], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def vecd_norm(t):
    return jnp.sqrt(jnp.sum(t * t, axis=-1))


def vecd_deff(t):
    """Effective deformation rate sqrt(2/3) * |d_vecd| (ecmech::vecd_Deff)."""
    return SQR2B3 * vecd_norm(t)


# ----------------------------------------------------------------------------
# Quaternions and rotations
# ----------------------------------------------------------------------------

def quat_to_rmat(q):
    """Rotation matrix from a unit quaternion [q0, q1, q2, q3].

    Matches ExaModel::Quat2RMat (src/mechanics_model.cpp:525-544): with this
    convention a vector with crystal-frame components ``c`` has sample-frame
    components ``R @ c``.
    """
    q0, q1, q2, q3 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    qbar = q0 * q0 - (q1 * q1 + q2 * q2 + q3 * q3)
    r00 = qbar + 2.0 * q1 * q1
    r10 = 2.0 * (q1 * q2 + q0 * q3)
    r20 = 2.0 * (q1 * q3 - q0 * q2)
    r01 = 2.0 * (q1 * q2 - q0 * q3)
    r11 = qbar + 2.0 * q2 * q2
    r21 = 2.0 * (q2 * q3 + q0 * q1)
    r02 = 2.0 * (q1 * q3 + q0 * q2)
    r12 = 2.0 * (q2 * q3 - q0 * q1)
    r22 = qbar + 2.0 * q3 * q3
    rows = [
        jnp.stack([r00, r01, r02], axis=-1),
        jnp.stack([r10, r11, r12], axis=-1),
        jnp.stack([r20, r21, r22], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def quat_multiply(a, b):
    """Hamilton product a*b (rotation composition: R(a*b) = R(a) @ R(b))."""
    a0, a1, a2, a3 = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    b0, b1, b2, b3 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            a0 * b0 - a1 * b1 - a2 * b2 - a3 * b3,
            a0 * b1 + a1 * b0 + a2 * b3 - a3 * b2,
            a0 * b2 - a1 * b3 + a2 * b0 + a3 * b1,
            a0 * b3 + a1 * b2 - a2 * b1 + a3 * b0,
        ],
        axis=-1,
    )


def expmap_to_quat(xi):
    """Unit quaternion of the rotation exp([xi]_x), |xi| = angle.

    Uses the double-where pattern so both the value AND the derivative are
    finite at xi = 0 (a bare sqrt/|xi| would propagate NaN through jacfwd).
    """
    ang2 = jnp.sum(xi * xi, axis=-1)
    big = ang2 > 1e-24
    ang2_safe = jnp.where(big, ang2, 1.0)
    ang = jnp.sqrt(ang2_safe)
    q0 = jnp.where(big, jnp.cos(0.5 * ang), 1.0 - ang2 / 8.0)
    sinc_half = jnp.where(big, jnp.sin(0.5 * ang) / ang, 0.5 - ang2 / 48.0)
    qv = xi * sinc_half[..., None]
    return jnp.concatenate([q0[..., None], qv], axis=-1)


def normalize_quat(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_conjugate(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_to_expmap(q):
    """Inverse of expmap_to_quat (rotation log map), NaN-safe at identity."""
    qv2 = jnp.sum(q[..., 1:] * q[..., 1:], axis=-1)
    big = qv2 > 1e-28
    qv_norm = jnp.sqrt(jnp.where(big, qv2, 1.0))
    ang = 2.0 * jnp.arctan2(qv_norm, q[..., 0])
    fac = jnp.where(big, ang / qv_norm,
                    2.0 / jnp.maximum(q[..., 0],
                                      float(jnp.finfo(q.dtype).tiny)))
    return q[..., 1:] * fac[..., None]


def rmat_to_vecd_rot(r):
    """5x5 rotation acting on vecd components: vecd(R A R^T) = Q5 @ vecd(A)."""
    basis = jnp.asarray(BASIS_DEV, dtype=r.dtype)
    rb = jnp.einsum("...im,kmn,...jn->...kij", r, basis, r)
    return jnp.einsum("lij,...kij->...lk", basis, rb)


def rotate_vecd(r, t):
    """vecd components of R A R^T given vecd(A)."""
    basis = jnp.asarray(BASIS_DEV, dtype=t.dtype)
    a = jnp.einsum("kij,...k->...ij", basis, t)
    ra = jnp.einsum("...im,...mn,...jn->...ij", r, a, r)
    return jnp.einsum("kij,...ij->...k", basis, ra)


def rotate_wvec(r, w):
    """Axial vector of R W R^T = R @ w for proper rotations."""
    return jnp.einsum("...ij,...j->...i", r, w)
