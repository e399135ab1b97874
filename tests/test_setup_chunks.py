"""Element-chunked fused setup (driver._setup_core_cm under lax.map).

The chunked path exists to bound XLA HLO-temp footprints at production
mesh sizes (48^3+ EA remat copies tile-pad 56.9x on TPU — BENCH_r02/r03
OOM dumps); it must be bit-for-bit equivalent to the monolithic setup:
chunking splits only the element batch axis, never a reduction.
"""
import os

import numpy as np
import pytest


def _build(nc_env):
    old = os.environ.get("EXACONSTIT_SETUP_CHUNKS")
    os.environ["EXACONSTIT_SETUP_CHUNKS"] = nc_env
    try:
        import __graft_entry__ as g
        return g._tiny_problem([4, 4, 2])
    finally:
        if old is None:
            os.environ.pop("EXACONSTIT_SETUP_CHUNKS", None)
        else:
            os.environ["EXACONSTIT_SETUP_CHUNKS"] = old


@pytest.mark.parametrize("nc", ["4", "auto"])
def test_chunked_setup_matches_monolithic(nc):
    import jax.numpy as jnp

    sys1, v0, x0, state, ess = _build("1")
    sysn, _, _, _, _ = _build(nc)
    assert sys1._setup_nc == 1
    if nc == "4":
        assert sysn._setup_nc == 4
    else:
        assert sysn._setup_nc == 1  # tiny mesh: auto stays monolithic

    # small plastic-flow velocity so the material solve has real work
    rng = np.random.default_rng(0)
    v = v0 + 0.01 * jnp.asarray(rng.standard_normal(v0.shape))
    dt = 0.05
    xw = sys1._warm_zeros(state.dtype)
    ok = jnp.asarray(False)

    out1 = sys1._setup(v, x0, state, dt, ess, True, 1, xw, ok)
    outn = sysn._setup(v, x0, state, dt, ess, True, 1, xw, ok)
    names = ["r", "k_cm", "diag", "stress_q", "state_end", "x_sol"]
    for name, a, b in zip(names, out1, outn):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=1e-12,
            err_msg=f"chunked setup diverges on {name}")
