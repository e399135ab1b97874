"""Barlat Yld2004-18p fit tests (workflows/uq_sweep/barlat_fit.py)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "workflows", "uq_sweep"))

import barlat_fit as bf  # noqa: E402


def vm_equiv(svec):
    s11, s22, s33, s23, s13, s12 = svec
    return np.sqrt(0.5 * ((s11 - s22) ** 2 + (s22 - s33) ** 2
                          + (s33 - s11) ** 2)
                   + 3.0 * (s23 ** 2 + s13 ** 2 + s12 ** 2))


def rand_states(n, seed=0):
    rng = np.random.default_rng(seed)
    S = rng.normal(size=(n, 6))
    S[:, 3:] *= 0.5
    return S


def test_phi_unit_coeffs_a2_is_von_mises():
    ones = np.ones(9)
    for s in rand_states(12):
        np.testing.assert_allclose(bf.phi(s, ones, ones, 2.0),
                                   vm_equiv(s), rtol=1e-10)


def test_r_value_isotropic_is_one():
    ones = np.ones(9)
    for th in (0.0, np.pi / 6, np.pi / 4):
        np.testing.assert_allclose(bf.r_value(ones, ones, 2.0, th), 1.0,
                                   atol=1e-5)


def test_fit_recovers_anisotropic_surface():
    rng = np.random.default_rng(3)
    c1_true = 1.0 + 0.25 * rng.uniform(-1, 1, 9)
    c2_true = 1.0 + 0.25 * rng.uniform(-1, 1, 9)
    a = 8.0
    Y = 0.05
    # yield-point states: scale random directions onto the true surface
    dirs = rand_states(40, seed=7)
    states = np.array([d * (Y / bf.phi(d, c1_true, c2_true, a))
                       for d in dirs])
    res = bf.fit(states[:32], a=a)
    assert res["rms"] < 2e-3, res["rms"]
    # predictive: held-out states sit on the fitted surface too
    c1 = np.asarray(res["c_prime"])
    c2 = np.asarray(res["c_dprime"])
    yref = res["sigma_bar_ref"]
    pred = np.array([bf.phi(s, c1, c2, a) / yref for s in states[32:]])
    np.testing.assert_allclose(pred, 1.0, atol=5e-3)
