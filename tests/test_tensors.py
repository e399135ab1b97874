"""Tensor-convention round-trip and rotation tests."""

import jax.numpy as jnp
import numpy as np

from exaconstit_tpu.utils import tensors as tn


def rand_sym(rng, dev=False):
    a = rng.normal(size=(3, 3))
    a = 0.5 * (a + a.T)
    if dev:
        a -= np.trace(a) / 3.0 * np.eye(3)
    return a


def test_svec_vecd_roundtrip():
    rng = np.random.default_rng(1)
    a = rand_sym(rng, dev=True)
    s = tn.mat_to_svec(jnp.asarray(a))
    t = tn.svec_to_vecd(s)
    t2 = tn.mat_to_vecd(jnp.asarray(a))
    np.testing.assert_allclose(np.asarray(t), np.asarray(t2), atol=1e-14)
    s2 = tn.vecd_to_svec(t)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s), atol=1e-14)
    # norm preservation
    assert abs(float(jnp.sum(t * t)) - np.sum(a * a)) < 1e-13


def test_wvec_roundtrip():
    rng = np.random.default_rng(2)
    a = rng.normal(size=(3, 3))
    w = tn.mat_to_wvec(jnp.asarray(a))
    W = tn.wvec_to_mat(w)
    np.testing.assert_allclose(np.asarray(W), 0.5 * (a - a.T), atol=1e-14)


def test_quat_rmat():
    rng = np.random.default_rng(3)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    R = np.asarray(tn.quat_to_rmat(jnp.asarray(q)))
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-13)
    assert abs(np.linalg.det(R) - 1.0) < 1e-13


def test_quat_multiply_matches_matmul():
    rng = np.random.default_rng(4)
    qa = rng.normal(size=4); qa /= np.linalg.norm(qa)
    qb = rng.normal(size=4); qb /= np.linalg.norm(qb)
    Rab = np.asarray(tn.quat_to_rmat(tn.quat_multiply(jnp.asarray(qa),
                                                      jnp.asarray(qb))))
    Ra = np.asarray(tn.quat_to_rmat(jnp.asarray(qa)))
    Rb = np.asarray(tn.quat_to_rmat(jnp.asarray(qb)))
    np.testing.assert_allclose(Rab, Ra @ Rb, atol=1e-13)


def test_expmap_quat():
    xi = np.array([0.0, 0.0, np.pi / 2])
    R = np.asarray(tn.quat_to_rmat(tn.expmap_to_quat(jnp.asarray(xi))))
    # rotation by 90 deg about z: x -> y
    np.testing.assert_allclose(R @ np.array([1.0, 0, 0]),
                               np.array([0.0, 1.0, 0.0]), atol=1e-13)
    # zero map
    R0 = np.asarray(tn.quat_to_rmat(tn.expmap_to_quat(jnp.zeros(3))))
    np.testing.assert_allclose(R0, np.eye(3), atol=1e-13)


def test_rotate_vecd_consistency():
    rng = np.random.default_rng(5)
    a = rand_sym(rng, dev=True)
    q = rng.normal(size=4); q /= np.linalg.norm(q)
    R = tn.quat_to_rmat(jnp.asarray(q))
    lhs = tn.rotate_vecd(R, tn.mat_to_vecd(jnp.asarray(a)))
    rhs = tn.mat_to_vecd(R @ jnp.asarray(a) @ R.T)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-13)
    # 5x5 matrix version agrees and is orthogonal
    Q5 = tn.rmat_to_vecd_rot(R)
    np.testing.assert_allclose(np.asarray(Q5 @ tn.mat_to_vecd(jnp.asarray(a))),
                               np.asarray(lhs), atol=1e-13)
    np.testing.assert_allclose(np.asarray(Q5 @ Q5.T), np.eye(5), atol=1e-13)


def test_rotate_wvec():
    rng = np.random.default_rng(6)
    w = rng.normal(size=3)
    q = rng.normal(size=4); q /= np.linalg.norm(q)
    R = tn.quat_to_rmat(jnp.asarray(q))
    W = tn.wvec_to_mat(jnp.asarray(w))
    lhs = tn.mat_to_wvec(R @ W @ R.T)
    rhs = tn.rotate_wvec(R, jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-13)
