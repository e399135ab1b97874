"""Component-major (batch-minor) hot path vs the point-major reference
implementation.

The CM pipeline (fem/geometry.py + fem/operators.py *_cm, driver
setup_fn_cm, models/ecmech.model_setup_cm) reorders every array so the
element/point batch is the minor axis — zero TPU tile padding — but must
be bit-for-bit the same math.  These tests drive both paths on the same
small problem and compare everything the Newton solver consumes.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _make_system(no_cm, workdir):
    from exaconstit_tpu.driver import Simulation, parse_options

    env = os.environ
    old = env.get("EXACONSTIT_TPU_NO_CM")
    old_asm = env.get("EXACONSTIT_EA_ASM_F32")
    env["EXACONSTIT_TPU_NO_CM"] = "1" if no_cm else "0"
    # bit-for-bit CM-vs-PM comparison: pin the EA assembly to f64 on
    # both paths (the CM production default builds the blocks in f32 —
    # a deliberate ~1e-7-relative Jacobian, tested by the regression
    # gates, not by this equivalence suite)
    env["EXACONSTIT_EA_ASM_F32"] = "0"
    try:
        opt = parse_options("/root/reference/test/data/voce_full.toml")
        sim = Simulation(opt, workdir=str(workdir))
    finally:
        if old is None:
            env.pop("EXACONSTIT_TPU_NO_CM", None)
        else:
            env["EXACONSTIT_TPU_NO_CM"] = old
        if old_asm is None:
            env.pop("EXACONSTIT_EA_ASM_F32", None)
        else:
            env["EXACONSTIT_EA_ASM_F32"] = old_asm
    return sim


@pytest.fixture(scope="module")
def sims(tmp_path_factory):
    pm = _make_system(True, tmp_path_factory.mktemp("pmwork"))
    cm = _make_system(False, tmp_path_factory.mktemp("cmwork"))
    assert not pm.system.use_cm
    assert cm.system.use_cm
    return pm, cm


def test_operators_cm_match_pm():
    """Pure-function check: CM EA assembly/apply/diagonal/residual vs PM."""
    from exaconstit_tpu.fem import operators as ops
    from exaconstit_tpu.fem.space import FESpace
    from exaconstit_tpu.mesh.voxel import make_cartesian_mesh

    mesh = make_cartesian_mesh([3, 3, 3], [1.0] * 3, order=1)
    fes = FESpace.create(mesh)
    rng = np.random.default_rng(0)
    ne, nen, nq = fes.num_elems, fes.ref.nnodes, fes.nqpts
    x = np.asarray(mesh.coords)[np.asarray(fes.conn)]  # (ne, nen, 3)
    x = x + 0.01 * rng.standard_normal(x.shape)
    c6 = rng.standard_normal((ne, nq, 6, 6))
    c6 = c6 + c6.swapaxes(-1, -2) + 10.0 * np.eye(6)
    stress = rng.standard_normal((ne, nq, 6))
    u = rng.standard_normal((ne, nen, 3))
    dshape = jnp.asarray(fes.ref.dshape)
    qwts = jnp.asarray(fes.ref.qwts)
    dt = 0.37

    x_cm = jnp.asarray(x.transpose(2, 1, 0))
    c6_cm = jnp.asarray(c6.transpose(2, 3, 1, 0))
    stress_cm = jnp.asarray(stress.transpose(2, 1, 0))
    u_cm = jnp.asarray(u.transpose(2, 1, 0))

    f_pm = np.asarray(ops.residual_force(jnp.asarray(x), dshape, qwts,
                                         jnp.asarray(stress)))
    f_cm = np.asarray(ops.residual_force_cm(x_cm, dshape, qwts, stress_cm))
    np.testing.assert_allclose(f_cm.transpose(2, 1, 0), f_pm, rtol=1e-12,
                               atol=1e-12)

    k_pm = np.asarray(ops.assemble_ea_gradient(jnp.asarray(x), dshape, qwts,
                                               jnp.asarray(c6), dt))
    k_cm = np.asarray(ops.assemble_ea_gradient_cm(x_cm, dshape, qwts, c6_cm,
                                                  dt))
    np.testing.assert_allclose(k_cm.transpose(2, 0, 1), k_pm, rtol=1e-12,
                               atol=1e-10)

    y_pm = np.asarray(ops.apply_ea_gradient(jnp.asarray(k_pm),
                                            jnp.asarray(u)))
    y_cm = np.asarray(ops.apply_ea_gradient_cm(jnp.asarray(
        k_pm.transpose(1, 2, 0)), u_cm))
    np.testing.assert_allclose(y_cm.transpose(2, 1, 0), y_pm, rtol=1e-12,
                               atol=1e-10)

    d_pm = np.asarray(ops.ea_diagonal(jnp.asarray(k_pm), nen))
    d_cm = np.asarray(ops.ea_diagonal_cm(jnp.asarray(
        k_pm.transpose(1, 2, 0)), nen))
    np.testing.assert_allclose(d_cm.transpose(2, 1, 0), d_pm, rtol=1e-12,
                               atol=1e-12)

    w_pm = np.asarray(ops.quad_point_volumes(jnp.asarray(x), dshape, qwts))
    w_cm = np.asarray(ops.quad_point_volumes_cm(x_cm, dshape, qwts))
    np.testing.assert_allclose(w_cm.T, w_pm, rtol=1e-12, atol=1e-14)


def test_setup_matches(sims):
    """Residual/diagonal/stress/state from the CM setup == PM setup."""
    pm, cm = sims
    sp, sc = pm.system, cm.system
    v_np = 0.001 * np.random.default_rng(1).standard_normal(
        (sp.fes.num_nodes, 3))
    x_np = np.asarray(sp.fes.mesh.coords)
    state_np = np.asarray(pm.state)  # point-major (pm system layout)
    ess_np = np.zeros((sp.fes.num_nodes, 3), bool)
    dt = 0.1
    # each system consumes its own jit-boundary layout
    vp, xp, essp = jnp.asarray(v_np), jnp.asarray(x_np), \
        jnp.asarray(ess_np.reshape(-1))
    vc, xc, essc = sc.to_node(v_np), sc.to_node(x_np), sc.to_ess(ess_np)
    statec = sc.to_state(state_np)
    statep = jnp.asarray(state_np)
    nsub_p = sp._compute_nsub(vp, xp, dt)
    nsub_c = sc._compute_nsub(vc, xc, dt)
    xw_p = jnp.zeros((8, sp._warm_npts), statep.dtype)
    xw_c = jnp.zeros((8, sc._warm_npts), statep.dtype)
    cold = jnp.asarray(False)
    rp, kp, dp_, stp, sep = sp._setup(vp, xp, statep, dt, essp, True,
                                      nsub_p, xw_p, cold)[:5]
    rc, kc, dc, stc, sec = sc._setup(vc, xc, statec, dt, essc, True,
                                     nsub_c, xw_c, cold)[:5]
    np.testing.assert_allclose(sc.from_node(rc).reshape(-1),
                               np.asarray(rp), rtol=2e-11, atol=1e-13)
    np.testing.assert_allclose(sc.from_node(dc).reshape(-1),
                               np.asarray(dp_), rtol=2e-11, atol=1e-13)
    np.testing.assert_allclose(sc.from_stress(stc), np.asarray(stp),
                               rtol=5e-9, atol=1e-12)
    np.testing.assert_allclose(sc.from_state(sec), np.asarray(sep),
                               rtol=5e-8, atol=1e-11)
    # CM stiffness == PM stiffness (transposed layout)
    np.testing.assert_allclose(np.asarray(kc).transpose(2, 0, 1),
                               np.asarray(kp), rtol=2e-9, atol=1e-11)


def test_newton_step_matches(sims):
    """One full adaptive Newton solve agrees across layouts."""
    pm, cm = sims
    for sim in (pm, cm):
        sim.nsteps = 1
    pm.run(verbose=False)
    cm.run(verbose=False)
    # state column 3 is the NFEVAL diagnostic (dogleg iteration count);
    # the CM path warm-starts the point solve across Newton iterations,
    # so its counts legitimately differ from the cold PM path
    st_c = cm.system.from_state(cm.state).copy()
    st_p = np.asarray(pm.state).copy()
    st_c[:, :, 3] = 0.0
    st_p[:, :, 3] = 0.0
    np.testing.assert_allclose(st_c, st_p, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(cm.system.from_stress(cm.stress),
                               np.asarray(pm.stress),
                               rtol=1e-7, atol=1e-9)
