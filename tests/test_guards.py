"""Numerics-guard tests (utils/guards.py): the jit-safe assertion story
mirroring the reference's MFEM_ASSERT/MFEM_VERIFY layer (SURVEY §5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_checked_jit_off_is_plain_jit(monkeypatch):
    monkeypatch.delenv("EXACONSTIT_CHECK_NUMERICS", raising=False)
    from exaconstit_tpu.utils.guards import checked_jit

    f = checked_jit(lambda x: jnp.log(x))
    # no error machinery: NaN flows through silently, like jax.jit
    out = f(jnp.asarray(-1.0))
    assert np.isnan(np.asarray(out))


def test_checked_jit_raises_on_nan(monkeypatch):
    monkeypatch.setenv("EXACONSTIT_CHECK_NUMERICS", "1")
    from exaconstit_tpu.utils.guards import checked_jit

    def solve_like(a, b):
        y = a / jnp.maximum(b, 1e-30)
        return jnp.sqrt(y)  # NaN for y < 0

    f = checked_jit(solve_like)
    np.testing.assert_allclose(np.asarray(f(jnp.asarray(4.0),
                                            jnp.asarray(1.0))), 2.0)
    with pytest.raises(Exception, match="nan"):
        f(jnp.asarray(-4.0), jnp.asarray(1.0))


def test_checked_jit_static_argnums(monkeypatch):
    monkeypatch.setenv("EXACONSTIT_CHECK_NUMERICS", "1")
    from exaconstit_tpu.utils.guards import checked_jit

    f = checked_jit(lambda x, n: x ** n, static_argnums=(1,))
    np.testing.assert_allclose(np.asarray(f(jnp.asarray(3.0), 2)), 9.0)


def test_checked_jit_passes_nan_safe_kinetics(monkeypatch):
    """The production kinetics' double-where guards must not trip the
    checker: zero resolved shear (the classic masked-log case) is clean."""
    monkeypatch.setenv("EXACONSTIT_CHECK_NUMERICS", "1")
    from exaconstit_tpu.models import kinetics
    from exaconstit_tpu.utils.guards import checked_jit

    kin = kinetics.VocePL(mu=45.0, xm=0.1, gdot0=1.0, h0=0.0, g0=0.01,
                          gs0=0.02, xms=0.0, gam_s=1.0, hdn_init=0.01)
    f = checked_jit(lambda t, h: kin.gdots(t, h, 300.0))
    taus = jnp.asarray([0.0, 1e-3, -1e-3, 5e-3])
    h = jnp.asarray([0.01])
    out = np.asarray(f(taus, h))
    assert np.isfinite(out).all() and out[0] == 0.0
