"""Slip-system geometry for FCC / BCC / HCP crystals.

Equivalent of ExaCMech's SlipGeom_FCC_A / SlipGeom_BCC_A / HCP slip
geometries (referenced from src/mechanics_ecmech.hpp:407-463): each slip
system s contributes a symmetric (deviatoric) Schmid tensor
P_s = sym(m_s x n_s) stored as a vecd 5-vector, and a skew part
Q_s = skw(m_s x n_s) stored as a wvec 3-vector, both in the crystal frame.

Slip-count bookkeeping matches the driver (src/mechanics_driver.cpp:351-356):
FCC 12, BCC 12, HCP 24.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

from ..utils.tensors import BASIS_DEV


@dataclasses.dataclass(frozen=True)
class SlipGeom:
    name: str
    P: np.ndarray  # (nslip, 5) symmetric Schmid, vecd components
    Q: np.ndarray  # (nslip, 3) skew Schmid, wvec components [W32, W13, W21]

    @property
    def nslip(self):
        return self.P.shape[0]


def _build(name, m_list, n_list):
    m = np.asarray(m_list, dtype=float)
    n = np.asarray(n_list, dtype=float)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    # orthogonality sanity
    assert np.max(np.abs(np.sum(m * n, axis=1))) < 1e-12
    T = np.einsum("si,sj->sij", m, n)
    sym = 0.5 * (T + np.swapaxes(T, 1, 2))
    skw = 0.5 * (T - np.swapaxes(T, 1, 2))
    P = np.einsum("kij,sij->sk", BASIS_DEV, sym)
    Q = np.stack([skw[:, 2, 1], skw[:, 0, 2], skw[:, 1, 0]], axis=-1)
    return SlipGeom(name=name, P=P, Q=Q)


@functools.lru_cache(maxsize=None)
def fcc12() -> SlipGeom:
    """FCC {111}<110>, 12 systems (SlipGeom_FCC_A equivalent)."""
    planes = [(1, 1, 1), (-1, 1, 1), (1, -1, 1), (1, 1, -1)]
    m_list, n_list = [], []
    for n in planes:
        na = np.array(n, dtype=float)
        # the three <110> directions lying in plane n
        dirs = []
        for d in [(0, 1, -1), (1, 0, -1), (1, -1, 0),
                  (0, 1, 1), (1, 0, 1), (1, 1, 0)]:
            da = np.array(d, dtype=float)
            if abs(np.dot(da, na)) < 1e-12:
                dirs.append(da)
                if len(dirs) == 3:
                    break
        for d in dirs:
            m_list.append(d)
            n_list.append(na)
    assert len(m_list) == 12
    return _build("fcc12", m_list, n_list)


@functools.lru_cache(maxsize=None)
def bcc12() -> SlipGeom:
    """BCC {110}<111>, 12 systems (SlipGeom_BCC_A equivalent)."""
    planes = [(0, 1, 1), (0, 1, -1), (1, 0, 1), (1, 0, -1),
              (1, 1, 0), (1, -1, 0)]
    m_list, n_list = [], []
    for n in planes:
        na = np.array(n, dtype=float)
        dirs = []
        for d in [(1, 1, 1), (-1, 1, 1), (1, -1, 1), (1, 1, -1)]:
            da = np.array(d, dtype=float)
            if abs(np.dot(da, na)) < 1e-12:
                dirs.append(da)
        assert len(dirs) == 2
        for d in dirs:
            m_list.append(d)
            n_list.append(na)
    assert len(m_list) == 12
    return _build("bcc12", m_list, n_list)


@functools.lru_cache(maxsize=None)
def hcp24(c_over_a: float = 1.587) -> SlipGeom:
    """HCP 24 systems: 3 basal + 3 prismatic + 6 pyramidal<a> + 12 pyr<c+a>.

    Matches the aBRYcaY1 system count used by ecmech::matModelEvptn_HCP_A
    (gdot size 24, src/mechanics_driver.cpp:354-355).
    Miller-Bravais -> Cartesian with x || a1, z || c.
    """
    r = float(c_over_a)

    def mb_dir(u, v, t, w):
        # direction [uvtw] -> cartesian
        return np.array([1.5 * u, (u + 2.0 * v) * np.sqrt(3.0) / 2.0, w * r])

    def mb_plane(h, k, i, l):
        # plane normal (hkil) -> cartesian (reciprocal lattice)
        return np.array([h, (h + 2.0 * k) / np.sqrt(3.0), l / r])

    m_list, n_list = [], []
    a_dirs = [(2, -1, -1, 0), (-1, 2, -1, 0), (-1, -1, 2, 0)]
    # basal (0001)<11-20>
    for d in a_dirs:
        m_list.append(mb_dir(*d))
        n_list.append(mb_plane(0, 0, 0, 1))
    # prismatic {10-10}<11-20>
    pris = [((0, 1, -1, 0), (2, -1, -1, 0)),
            ((-1, 0, 1, 0), (-1, 2, -1, 0)),
            ((1, -1, 0, 0), (-1, -1, 2, 0))]
    for pl, d in pris:
        m_list.append(mb_dir(*d))
        n_list.append(mb_plane(*pl))
    # pyramidal <a> {10-11}<11-20>
    pyr_a = [((0, 1, -1, 1), (2, -1, -1, 0)),
             ((-1, 0, 1, 1), (-1, 2, -1, 0)),
             ((1, -1, 0, 1), (-1, -1, 2, 0)),
             ((0, -1, 1, 1), (2, -1, -1, 0)),
             ((1, 0, -1, 1), (-1, 2, -1, 0)),
             ((-1, 1, 0, 1), (-1, -1, 2, 0))]
    for pl, d in pyr_a:
        m_list.append(mb_dir(*d))
        n_list.append(mb_plane(*pl))
    # pyramidal <c+a> {10-11}<11-23>: two <c+a> per each of six planes
    pyr_ca_planes = [(1, 0, -1, 1), (0, 1, -1, 1), (-1, 1, 0, 1),
                     (-1, 0, 1, 1), (0, -1, 1, 1), (1, -1, 0, 1)]
    ca_dirs = [(-2, 1, 1, 3), (-1, -1, 2, 3), (1, -2, 1, 3),
               (2, -1, -1, 3), (1, 1, -2, 3), (-1, 2, -1, 3)]
    for pl in pyr_ca_planes:
        npl = mb_plane(*pl)
        found = []
        for d in ca_dirs:
            dd = mb_dir(*d)
            if abs(np.dot(dd, npl)) < 1e-9 * np.linalg.norm(dd) * np.linalg.norm(npl):
                found.append(dd)
        assert len(found) == 2, (pl, len(found))
        for dd in found:
            m_list.append(dd)
            n_list.append(npl)
    assert len(m_list) == 24
    return _build("hcp24", m_list, n_list)


def get_slip_geom(xtal_type: str, c_over_a: float = 1.587) -> SlipGeom:
    xt = xtal_type.lower()
    if xt == "fcc":
        return fcc12()
    if xt == "bcc":
        return bcc12()
    if xt == "hcp":
        return hcp24(c_over_a)
    raise ValueError(f"unknown xtal type {xtal_type}")
