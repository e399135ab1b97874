"""Component-major engine (models/evptn_cm.py) vs the vmapped reference
formulation: identical semantics, different data layout."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from exaconstit_tpu.models import evptn as EV
from exaconstit_tpu.models import evptn_cm as CM
from exaconstit_tpu.models import elasticity, kinetics, slip_geom
from exaconstit_tpu.models.eos import EosConst
from exaconstit_tpu.solvers.linalg_small import solve_dense


def make_model(**over):
    elast = elasticity.cubic(168.4, 121.4, 75.2)
    kin = kinetics.VocePL(mu=44.0, xm=0.02, gdot0=1.0, h0=0.4, g0=0.017,
                          gs0=0.1224, xms=0.0, gam_s=5e9, hdn_init=0.017)
    eos = EosConst(bulk=elast.bulk, gruneisen=0.0, rho0=8.92e-6, e0=0.0)
    defaults = dict(slip=slip_geom.fcc12(), elast=elast, kinetics=kin,
                    eos=eos, solver_tol=1e-10, mixed_precision=False)
    defaults.update(over)
    return EV.EvptnModel(**defaults)


def rand_inputs(n, seed=0, scale=1e-3):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3, 3)) * scale
    d = 0.5 * (d + np.swapaxes(d, 1, 2))
    d -= np.trace(d, axis1=1, axis2=2)[:, None, None] / 3.0 * np.eye(3)
    from exaconstit_tpu.utils import tensors as tn
    d_vecd = np.asarray(tn.mat_to_vecd(jnp.asarray(d)))
    w = rng.normal(size=(n, 3)) * scale * 0.3
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    e = rng.normal(size=(n, 5)) * 2e-4
    h = np.full((n, 1), 0.017) + rng.uniform(0, 0.01, size=(n, 1))
    return (jnp.asarray(d_vecd), jnp.asarray(w), jnp.asarray(e),
            jnp.asarray(q), jnp.asarray(h))


def test_solve_dense_cm_matches_reference():
    rng = np.random.default_rng(1)
    A = rng.normal(size=(16, 8, 8)) + 4.0 * np.eye(8)
    b = rng.normal(size=(16, 8))
    x_ref = jax.vmap(solve_dense)(jnp.asarray(A), jnp.asarray(b))
    x_cm = CM.solve_dense_cm(jnp.asarray(A).transpose(1, 2, 0),
                             jnp.asarray(b).T).T
    np.testing.assert_allclose(np.asarray(x_cm), np.asarray(x_ref),
                               rtol=1e-11, atol=1e-13)


def test_residual_cm_matches_pointwise():
    model = make_model()
    n = 13
    d, w, e, q, h = rand_inputs(n)
    rng = np.random.default_rng(2)
    x = jnp.asarray(np.concatenate(
        [np.asarray(e) + rng.normal(size=(n, 5)) * 1e-5,
         rng.normal(size=(n, 3)) * 1e-4], axis=1))
    dt = 0.1
    r_ref = jax.vmap(lambda xx, hh, dd, ww, ee, qq: EV._residual(
        model, xx, hh, dt, dd, ww, ee, qq, 298.0))(x, h, d, w, e, q)
    Dsm = CM.vecd_to_mat_cm(d.T)
    r_cm = CM.residual_cm(model, x.T, h.T, dt, Dsm, w.T, e.T, q.T, 298.0).T
    np.testing.assert_allclose(np.asarray(r_cm), np.asarray(r_ref),
                               rtol=1e-10, atol=1e-18)


def test_jacobian_cm_matches_pointwise():
    model = make_model()
    n = 7
    d, w, e, q, h = rand_inputs(n, seed=5)
    dt = 0.1
    # at xi = 0 the commutator kinematics derivative is exact
    x = jnp.concatenate([e, jnp.zeros((n, 3))], axis=1)
    _, J_ref = jax.vmap(lambda xx, hh, dd, ww, ee, qq: EV._residual_and_jac(
        model, xx, hh, dt, dd, ww, ee, qq, 298.0))(x, h, d, w, e, q)
    Dsm = CM.vecd_to_mat_cm(d.T)
    _, J_cm = CM.residual_and_jac_cm(model, x.T, h.T, dt, Dsm, w.T, e.T,
                                     q.T, 298.0)
    np.testing.assert_allclose(np.asarray(J_cm).transpose(2, 0, 1),
                               np.asarray(J_ref), rtol=1e-7, atol=1e-12)

    # at small finite xi the first-order kinematics block stays within
    # O(|xi|) of the exact jacfwd derivative (Newton-quality, not exact)
    rng = np.random.default_rng(6)
    xi = jnp.asarray(rng.normal(size=(n, 3)) * 1e-3)
    x2 = jnp.concatenate([e, xi], axis=1)
    _, J_ref2 = jax.vmap(
        lambda xx, hh, dd, ww, ee, qq: EV._residual_and_jac(
            model, xx, hh, dt, dd, ww, ee, qq, 298.0))(x2, h, d, w, e, q)
    _, J_cm2 = CM.residual_and_jac_cm(model, x2.T, h.T, dt, Dsm, w.T, e.T,
                                      q.T, 298.0)
    scale = np.abs(np.asarray(J_ref2)).max()
    err = np.abs(np.asarray(J_cm2).transpose(2, 0, 1)
                 - np.asarray(J_ref2)).max() / scale
    assert err < 5e-3


def test_gdots_slope_matches_ad_voce():
    kin = make_model().kinetics
    taus = jnp.asarray([[0.002, -0.015, 1e-12, 0.019, -0.0021]])
    h = jnp.asarray([[0.017]])
    gd, slope = kin.gdots_slope(taus, h, 298.0)
    gd_ref = kin.gdots(taus, h, 298.0)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(gd_ref),
                               rtol=1e-12)
    g_ad = jax.vmap(jax.grad(lambda t: kin.gdots(t[None, None], h,
                                                 298.0)[0, 0]))(taus[0])
    np.testing.assert_allclose(np.asarray(slope)[0], np.asarray(g_ad),
                               rtol=1e-9, atol=1e-12)


def test_gdots_slope_matches_ad_kmbald():
    for ga in (False, True):
        kin = kinetics.KMBalD(
            mu_ref=47.26, tk_ref=300.0, c1=1944.106926, tau_a=4e-4, p=1.0,
            q=1.0, gam_wo=1.0, gam_ro=1.0, wr_d=0.03, go=0.008, s=0.1,
            k1=3e-4, k2_0=5e-5, ninv=0.1, gam_ro_dd=0.01,
            rho_dd_init=9e-4, g_athermal=ga)
        taus = jnp.asarray([[0.004, -0.009, 0.0115, 0.02, 1e-9, -0.012]])
        h = jnp.asarray([[9e-4]])
        gd, slope = kin.gdots_slope(taus, h, 298.0)
        gd_ref = kin.gdots(taus, h, 298.0)
        np.testing.assert_allclose(np.asarray(gd), np.asarray(gd_ref),
                                   rtol=1e-12, atol=1e-300)
        g_ad = jax.vmap(jax.grad(lambda t: kin.gdots(t[None, None], h,
                                                     298.0)[0, 0]))(taus[0])
        np.testing.assert_allclose(np.asarray(slope)[0], np.asarray(g_ad),
                                   rtol=1e-8, atol=1e-30)


@pytest.mark.parametrize("mixed", [False, True])
def test_staggered_solve_cm_matches_vmap(mixed):
    model = make_model(mixed_precision=mixed)
    n = 9
    d, w, e, q, h = rand_inputs(n, seed=7)
    dt = 0.1
    nsub = jnp.asarray(np.r_[np.ones(5), [2, 2, 3, 3]], jnp.int32)

    x_cm, h_cm, hu_cm, it_cm, ok_cm = CM.solve_staggered_cm(
        model, dt, d, w, e, q, h, 298.0, nsub)
    ref = jax.vmap(lambda dd, ww, ee, qq, hh, ns: EV._solve_point_staggered(
        model, dt, dd, ww, ee, qq, hh, 298.0, nsub=ns))(d, w, e, q, h, nsub)
    x_ref, h_ref, hu_ref, it_ref, ok_ref = ref
    assert bool(jnp.all(ok_cm)) and bool(jnp.all(ok_ref))
    np.testing.assert_allclose(np.asarray(x_cm), np.asarray(x_ref),
                               rtol=2e-6, atol=1e-11)
    np.testing.assert_allclose(np.asarray(h_cm), np.asarray(h_ref),
                               rtol=1e-8, atol=1e-12)


def test_batched_update_cm_engine_matches_vmap_engine():
    import dataclasses
    model_cm = make_model(engine="cm")
    model_vm = dataclasses.replace(model_cm, engine="vmap")
    n = 8
    d, w, e, q, h = rand_inputs(n, seed=11)
    v0 = jnp.ones(n)
    v1 = jnp.ones(n) * 1.0005
    ei = jnp.zeros(n)
    dt = 0.1
    out_cm = EV.batched_update(model_cm, dt, d, w, v0, v1, ei, e, q, h,
                               298.0)
    out_vm = EV.batched_update(model_vm, dt, d, w, v0, v1, ei, e, q, h,
                               298.0)
    for key in ("e_end", "q_end", "h_end", "s_vecd_sm", "tangent"):
        a, b = np.asarray(out_cm[key]), np.asarray(out_vm[key])
        scale = max(np.abs(b).max(), 1e-12)
        assert np.abs(a - b).max() / scale < 5e-6, key


def test_mixed_tangent_matches_f64():
    """The equilibrated f32 tangent solve with f64 defect correction must
    agree with the pure-f64 tangent to well below Newton-quality."""
    import dataclasses
    model64 = make_model(mixed_precision=False)
    modelmx = dataclasses.replace(model64, mixed_precision=True)
    n = 8
    d, w, e, q, h = rand_inputs(n, seed=13)
    v0 = jnp.ones(n)
    v1 = jnp.ones(n) * 1.0003
    ei = jnp.zeros(n)
    # stiff regime: big dt so dt*slope dominates the Jacobian rows
    dt = 0.5
    out64 = EV.batched_update(model64, dt, d, w, v0, v1, ei, e, q, h, 298.0)
    outmx = EV.batched_update(modelmx, dt, d, w, v0, v1, ei, e, q, h, 298.0)
    a = np.asarray(outmx["tangent"])
    b = np.asarray(out64["tangent"])
    err = np.abs(a - b).max() / np.abs(b).max()
    assert err < 1e-6, err
