"""Pallas VMEM-resident dogleg (solvers/dogleg_pallas.py) vs the XLA
component-major dogleg: identical solver semantics per tile.

Runs in interpret mode on the CPU test mesh; on a real TPU the same
wrapper lowers to a Mosaic kernel (EXACONSTIT_PALLAS=1 end to end).
Interpreter-mode execution is per-op, so the larger parity cases run
only under EXACONSTIT_FULL_REGRESSION=1 (the full gate)."""

import os

import numpy as np
import pytest

FULL = os.environ.get("EXACONSTIT_FULL_REGRESSION", "") == "1"

import jax
import jax.numpy as jnp

from exaconstit_tpu.models import evptn as EV
from exaconstit_tpu.models import evptn_cm as CM
from exaconstit_tpu.models import elasticity, kinetics, slip_geom
from exaconstit_tpu.models.eos import EosConst
from exaconstit_tpu.solvers.dogleg_pallas import dogleg_pallas


def make_model(**over):
    elast = elasticity.cubic(168.4, 121.4, 75.2)
    kin = kinetics.VocePL(mu=44.0, xm=0.02, gdot0=1.0, h0=0.4, g0=0.017,
                          gs0=0.1224, xms=0.0, gam_s=5e9, hdn_init=0.017)
    eos = EosConst(bulk=elast.bulk, gruneisen=0.0, rho0=8.92e-6, e0=0.0)
    defaults = dict(slip=slip_geom.fcc12(), elast=elast, kinetics=kin,
                    eos=eos, solver_tol=1e-10, mixed_precision=True)
    defaults.update(over)
    return EV.EvptnModel(**defaults)


def rand_inputs_cm(n, seed=0, scale=1e-3, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3, 3)) * scale
    d = 0.5 * (d + np.swapaxes(d, 1, 2))
    d -= np.trace(d, axis1=1, axis2=2)[:, None, None] / 3.0 * np.eye(3)
    from exaconstit_tpu.utils import tensors as tn
    d_vecd = np.asarray(tn.mat_to_vecd(jnp.asarray(d))).T  # (5, n)
    w = (rng.normal(size=(n, 3)) * scale * 0.3).T
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    e = (rng.normal(size=(n, 5)) * 2e-4).T
    h = (np.full((n, 1), 0.017) + rng.uniform(0, 0.01, size=(n, 1))).T
    c = lambda a: jnp.asarray(a, dtype)
    return c(d_vecd), c(w), c(e), c(q.T), c(h)


@pytest.mark.parametrize(
    "n", ([96] if FULL else [48]) + ([640] if FULL else []))
def test_pallas_dogleg_matches_cm(n):
    model = make_model()
    f32 = jnp.float32
    d, w, e, q, h = rand_inputs_cm(n, seed=3, dtype=f32)
    # default (interpret-mode, per-op python) runs a smaller, easier
    # batch; the full gate keeps the hard 0.08-dt 96/640-lane cases
    dt = jnp.full((n,), 0.08 if FULL else 0.04, f32)
    Dsm = CM.vecd_to_mat_cm(d)
    deff = jnp.sqrt(2.0 / 3.0 * jnp.sum(d * d, axis=0))
    e_guess = CM._initial_guess_cm(model, dt, Dsm, deff, e, q, h)
    x0 = jnp.concatenate([e_guess, jnp.zeros((3, n), f32)], axis=0)
    active = jnp.ones((n,), bool).at[5].set(False)
    tol, max_iter = 1e-6, 200

    def rj(x):
        return CM.residual_and_jac_cm(model, x, h, dt, Dsm, w, e, q, 300.0)

    x_ref, ok_ref, it_ref, _, J_ref = CM.dogleg_cm(rj, x0, tol, max_iter,
                                                   active0=active)
    x_pl, ok_pl, it_pl, _, J_pl = dogleg_pallas(
        model, x0, h, dt, d, w, e, q, active, tol, max_iter,
        tile=128 if FULL else 64, interpret=True)

    ok_ref = np.asarray(ok_ref)
    ok_pl = np.asarray(ok_pl)
    assert ok_ref.all() and ok_pl.all()
    # both converged to the same root at tol 1e-6: states agree to f32
    # roundoff of the Newton basin
    np.testing.assert_allclose(np.asarray(x_pl), np.asarray(x_ref),
                               rtol=0, atol=2e-5)
    # residuals at both solutions are below tol (active lanes only; the
    # masked lane stays at its unsolved x0)
    r_pl = CM.residual_cm(model, jnp.asarray(x_pl), h, dt, Dsm, w, e, q,
                          300.0)
    rn = jnp.sqrt(jnp.sum(r_pl * r_pl, axis=0))
    assert float(jnp.max(jnp.where(active, rn, 0.0))) < tol
    # inactive lane untouched
    np.testing.assert_array_equal(np.asarray(x_pl)[:, 5],
                                  np.asarray(x0)[:, 5])


def test_pallas_through_staggered_solve():
    """End-to-end: solve_staggered_cm_core with use_pallas=True matches
    the XLA path through the full mixed-precision substepped solve."""
    import dataclasses as dc
    n = 48 if FULL else 8
    f64 = jnp.float64
    model = make_model(mixed_precision=True)
    model_pl = dc.replace(model, use_pallas=True)
    d, w, e, q, h = rand_inputs_cm(n, seed=7, dtype=f64)
    nsub = jnp.full((n,), 1, jnp.int32)
    out_ref = CM.solve_staggered_cm_core(model, 0.1, d, w, e, q, h, 300.0,
                                         nsub)
    out_pl = CM.solve_staggered_cm_core(model_pl, 0.1, d, w, e, q, h,
                                        300.0, nsub)
    assert np.asarray(out_ref[4]).all() and np.asarray(out_pl[4]).all()
    # f64-polished states agree to the polish tolerance
    np.testing.assert_allclose(np.asarray(out_pl[0]),
                               np.asarray(out_ref[0]), rtol=0, atol=5e-9)
    np.testing.assert_allclose(np.asarray(out_pl[1]),
                               np.asarray(out_ref[1]), rtol=1e-8)


def test_pallas_default_gating(monkeypatch):
    """build_model defaults the kernel ON only for the real TPU backend
    (on CPU it would run in interpreter mode); EXACONSTIT_PALLAS
    overrides either way."""
    from exaconstit_tpu.config.options import (ExaOptions, MechType,
                                               SlipType, XtalType)
    from exaconstit_tpu.models.ecmech import build_model
    props = np.loadtxt("/root/reference/test/data/props_cp_voce.txt")
    opt = ExaOptions()
    opt.mech_type = MechType.EXACMECH
    opt.xtal_type = XtalType.FCC
    opt.slip_type = SlipType.POWERVOCE

    monkeypatch.delenv("EXACONSTIT_PALLAS", raising=False)
    expect = jax.default_backend() == "tpu"
    assert build_model(opt, props).evptn.use_pallas == expect

    monkeypatch.setenv("EXACONSTIT_PALLAS", "1")
    assert build_model(opt, props).evptn.use_pallas is True
    monkeypatch.setenv("EXACONSTIT_PALLAS", "0")
    assert build_model(opt, props).evptn.use_pallas is False
