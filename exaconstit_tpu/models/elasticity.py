"""Crystal thermo-elasticity in the deviatoric 5-vector basis.

Equivalent of ExaCMech's evptn::ThermoElastNCubic / hexagonal variants.
In the crystal frame the deviatoric stiffness is diagonal in the vecd
basis for cubic symmetry, and block-structured for hexagonal symmetry.

Stress convention: the model works with the deviatoric Kirchhoff-like
stress ``tau = C_dev : e`` in the lattice frame; the Cauchy deviator is
``tau / v`` with v the relative volume.  The bulk response is handled by
the EOS (see eos.py).
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class Elasticity:
    """Deviatoric elastic stiffness in vecd basis + bulk modulus."""

    C_dev: np.ndarray  # (5, 5) crystal frame
    bulk: float

    def stress_vecd(self, e_vecd):
        import jax.numpy as jnp

        return jnp.einsum("ij,...j->...i",
                          jnp.asarray(self.C_dev, dtype=e_vecd.dtype),
                          e_vecd)


def cubic(c11: float, c12: float, c44: float) -> Elasticity:
    """Cubic crystal: vecd stiffness diag(c11-c12, c11-c12, 2c44 x3)."""
    d = np.diag([c11 - c12, c11 - c12, 2 * c44, 2 * c44, 2 * c44]).astype(float)
    return Elasticity(C_dev=d, bulk=(c11 + 2.0 * c12) / 3.0)


def hexagonal(c11: float, c12: float, c13: float, c33: float,
              c44: float) -> Elasticity:
    """Hexagonal crystal (c axis || z).

    Derived by projecting the full Voigt stiffness onto the deviatoric
    vecd basis; the coupling between the two "diagonal" deviatoric modes
    (t0, t1) is retained.  c66 = (c11 - c12)/2.
    """
    c66 = 0.5 * (c11 - c12)
    # Full 6x6 stiffness in svec order [11,22,33,23,13,12], tensor strains
    C = np.zeros((6, 6))
    C[0, 0] = C[1, 1] = c11
    C[2, 2] = c33
    C[0, 1] = C[1, 0] = c12
    C[0, 2] = C[2, 0] = C[1, 2] = C[2, 1] = c13
    C[3, 3] = 2 * c44
    C[4, 4] = 2 * c44
    C[5, 5] = 2 * c66
    # Project: sigma_dev_vecd = Pdev_vecd( C : eps ) for deviatoric eps.
    from ..utils.tensors import BASIS_DEV

    # vecd basis tensor k -> tensor-strain svec components
    basis_svec = np.zeros((5, 6))
    for k in range(5):
        B = BASIS_DEV[k]
        basis_svec[k] = [B[0, 0], B[1, 1], B[2, 2], B[1, 2], B[0, 2], B[0, 1]]
    # stress svec for each basis strain: sig[k] = C : B_k
    sig = basis_svec @ C.T  # (5, 6)
    # C_dev[l, k] = B_l : (C : B_k)  (shear entries count twice in the dot)
    w = np.array([1.0, 1, 1, 2, 2, 2])
    C_dev = np.einsum("ls,s,ks->lk", basis_svec, w, sig)
    bulk = (2.0 * (c11 + c12) + 4.0 * c13 + c33) / 9.0
    return Elasticity(C_dev=C_dev, bulk=bulk)
