"""Sharded-vs-single-device equivalence (SURVEY.md section 7 phase 6).

The element-axis domain decomposition must reproduce the unsharded
results to roundoff: same jitted step, 1 device vs the 8-device virtual
CPU mesh (including element-count padding + masking).
"""

import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_step_matches_single_device():
    from __graft_entry__ import _tiny_problem
    from exaconstit_tpu.parallel.sharding import make_device_mesh

    # 3 elements per axis -> 27 elements, NOT divisible by 8: exercises
    # the padding/masking path
    sys1, v1, x1, st1, ess1 = _tiny_problem([3, 3, 3])
    step1 = sys1.make_jit_step(newton_iters=2)
    o1 = step1(v1, x1, st1, 0.01, ess1)

    dmesh = make_device_mesh(8)
    sys8, v8, x8, st8, ess8 = _tiny_problem([3, 3, 3], device_mesh=dmesh)
    step8 = sys8.make_jit_step(newton_iters=2)
    o8 = step8(v8, x8, st8, 0.01, ess8)

    # velocity field identical
    np.testing.assert_allclose(np.asarray(o8[0]), np.asarray(o1[0]),
                               rtol=1e-10, atol=1e-14)
    # stress on the real elements identical (system layout -> point-major)
    ne = sys1.fes.num_elems
    np.testing.assert_allclose(sys8.from_stress(o8[2])[:ne],
                               sys1.from_stress(o1[2])[:ne],
                               rtol=1e-9, atol=1e-13)
    # residual norms agree (converged -> near zero, so absolute tolerance)
    np.testing.assert_allclose(float(o8[4]), float(o1[4]), rtol=1e-6,
                               atol=1e-12)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_vol_average_sharded():
    from __graft_entry__ import _tiny_problem
    from exaconstit_tpu.parallel.sharding import make_device_mesh

    import jax.numpy as jnp

    sys1, v1, x1, st1, ess1 = _tiny_problem([3, 3, 3])
    dmesh = make_device_mesh(8)
    sys8, v8, x8, st8, ess8 = _tiny_problem([3, 3, 3], device_mesh=dmesh)

    el_x1 = sys1._gather_cm(x1) if sys1.use_cm else sys1._gather(x1)
    el_x8 = sys8._gather_cm(x8) if sys8.use_cm else sys8._gather(x8)
    q1 = jnp.ones((6, sys1.fes.nqpts, sys1.ne_pad) if sys1.use_cm
                  else (sys1.ne_pad, sys1.fes.nqpts, 6))
    q8 = jnp.ones((6, sys8.fes.nqpts, sys8.ne_pad) if sys8.use_cm
                  else (sys8.ne_pad, sys8.fes.nqpts, 6))
    a1 = np.asarray(sys1._vol_avg(q1, el_x1, True))
    a8 = np.asarray(sys8._vol_avg(q8, el_x8, True))
    np.testing.assert_allclose(a8, a1, rtol=1e-12)
    np.testing.assert_allclose(a1, 1.0, rtol=1e-12)
