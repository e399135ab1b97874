"""SlabMechSystem vs dense MechSystem parity on the crystal problem.

The slab (halo-exchange) path must reproduce the single-device Newton
solve: same converged velocity, stress, state, and volume averages.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def problem():
    from exaconstit_tpu.config.options import (Assembly, ExaOptions,
                                               KrylovSolver, MechType,
                                               SlipType, XtalType)
    from exaconstit_tpu.driver import MechSystem
    from exaconstit_tpu.mesh.voxel import make_cartesian_mesh
    from exaconstit_tpu.models.ecmech import build_model
    from __graft_entry__ import _VOCE_PROPS

    opt = ExaOptions()
    opt.mech_type = MechType.EXACMECH
    opt.xtal_type = XtalType.FCC
    opt.slip_type = SlipType.POWERVOCE
    opt.assembly = Assembly.EA
    opt.solver = KrylovSolver.PCG
    opt.krylov_rel_tol, opt.krylov_abs_tol, opt.krylov_iter = 1e-10, 1e-30, \
        300
    # slab-vs-dense comparisons at 1e-11-level atol need IDENTICAL
    # numerics on both sides: the slab path is f64-EA + Jacobi, so pin
    # the dense system to the same (its production defaults are the f32
    # EA block build + GMG, tested by the regression gates instead)
    opt.krylov_precond = "jacobi"

    mesh = make_cartesian_mesh([2, 2, 8], [1.0, 1.0, 1.0], order=1)
    model = build_model(opt, _VOCE_PROPS)
    os.environ["EXACONSTIT_EA_ASM_F32"] = "0"
    try:
        dense = MechSystem(opt, mesh, model)
    finally:
        os.environ.pop("EXACONSTIT_EA_ASM_F32", None)

    rng = np.random.default_rng(3)
    q = rng.normal(size=(mesh.num_elems, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    pt_quats = np.repeat(q, dense.fes.nqpts, axis=0)
    state = model.init_state(pt_quats).reshape(mesh.num_elems,
                                               dense.fes.nqpts, -1)

    ess = np.zeros((mesh.num_nodes, 3), dtype=bool)
    ess[mesh.bdr_nodes[1], 2] = True
    ess[mesh.bdr_nodes[2], 0] = True
    ess[mesh.bdr_nodes[3], 1] = True
    ess[mesh.bdr_nodes[4], 2] = True
    v0 = np.zeros((mesh.num_nodes, 3))
    v0[mesh.bdr_nodes[4], 2] = 1e-3
    return opt, mesh, model, dense, state, ess, v0


def test_slab_matches_dense(problem):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from exaconstit_tpu.parallel.sharding import make_device_mesh
    from exaconstit_tpu.parallel.slab_system import SlabMechSystem

    opt, mesh, model, dense, state, ess, v0 = problem
    dt = 0.05

    vd, stress_d, state_d, conv_d, it_d, _ = dense.newton_solve(
        dense.to_node(v0), dense.to_node(mesh.coords),
        dense.to_state(state), dt, ess, verbose=False)
    assert conv_d

    dmesh = make_device_mesh(8)
    slab = SlabMechSystem(opt, mesh, model, dmesh)
    v_l = slab.to_node(v0)
    x_l = slab.to_node(mesh.coords)
    st_l = slab.to_state(state)
    vs, stress_s, state_s, conv_s, it_s, _ = slab.newton_solve(
        v_l, x_l, st_l, dt, ess, verbose=False)
    assert conv_s

    # converged velocity matches everywhere
    v_glob = slab.to_global_nodes(vs)
    np.testing.assert_allclose(v_glob, dense.from_node(vd), atol=2e-12)
    # stress / state in original element order
    np.testing.assert_allclose(slab.unpermute_elems(stress_s),
                               dense.from_stress(stress_d), atol=1e-11)
    np.testing.assert_allclose(slab.unpermute_elems(state_s),
                               dense.from_state(state_d), atol=1e-10)
    # volume-averaged stress identical
    nq = dense.fes.nqpts
    avg_d = np.asarray(dense._vol_avg(
        stress_d.reshape(6, nq, -1),
        dense._gather_cm(dense.to_node(mesh.coords) + dt * vd), True))
    avg_s = np.asarray(slab._vol_avg(
        stress_s, slab._gather(x_l + dt * vs), True))
    # atol covers reduction-ordering noise on ~1e-9 components
    np.testing.assert_allclose(avg_s, avg_d, rtol=1e-12, atol=1e-14)


def test_slab_solve_init_matches_dense(problem):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from exaconstit_tpu.parallel.sharding import make_device_mesh
    from exaconstit_tpu.parallel.slab_system import SlabMechSystem

    opt, mesh, model, dense, state, ess, v0 = problem
    dt = 0.02
    v_new = v0.copy()
    v_new[mesh.bdr_nodes[4], 2] = 2e-3  # BC change

    out_d = dense.solve_init(dense.to_node(v0), dense.to_node(v_new),
                             dense.to_node(mesh.coords),
                             dense.to_state(state), dt, ess)

    dmesh = make_device_mesh(8)
    slab = SlabMechSystem(opt, mesh, model, dmesh)
    out_s = slab.solve_init(slab.to_node(v0),
                            slab.to_node(v_new),
                            slab.to_node(mesh.coords),
                            slab.to_state(state), dt, ess)
    np.testing.assert_allclose(slab.to_global_nodes(out_s),
                               dense.from_node(out_d), atol=1e-11)
