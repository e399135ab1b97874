"""UMAT (user-material) interface tests.

Exercises the host-callback UMAT path end-to-end against an isotropic
elastic UMAT built from native/umat_elastic.c (the reference keeps a
comparable Fortran fixture under src/umat_tests/).
"""

import os
import subprocess

import numpy as np
import pytest

NATIVE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                      "native")
LIB = os.path.join(NATIVE, "libumat_elastic.so")


@pytest.fixture(scope="module")
def umat_lib():
    if not os.path.exists(LIB):
        subprocess.run(["make", "libumat_elastic.so", "CC=gcc"], cwd=NATIVE,
                       check=True)
    return LIB


def test_umat_point_elastic(umat_lib):
    import jax.numpy as jnp

    from exaconstit_tpu.models.umat import UmatLibrary, UmatModel

    E, nu = 100.0, 0.3
    model = UmatModel(lib=UmatLibrary(umat_lib),
                      props=np.array([E, nu]), num_user_state=1)
    N = 4
    state = jnp.asarray(model.init_state(npts=N))
    L = jnp.asarray(np.tile(np.diag([0.0, 0.0, 1e-3]), (N, 1, 1)))
    stress, st, dd = model.model_setup(0.01, L, state)
    lam = E * nu / ((1 + nu) * (1 - 2 * nu))
    mu = E / (2 * (1 + nu))
    eps = 1e-5
    np.testing.assert_allclose(float(stress[0, 2]), (lam + 2 * mu) * eps,
                               rtol=1e-4)
    np.testing.assert_allclose(float(stress[0, 0]), lam * eps, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dd[0, 2, 2]), lam + 2 * mu,
                               rtol=1e-12)


def test_umat_simulation_uniaxial(umat_lib, tmp_path):
    """End-to-end: elastic UMAT under uniaxial tension reproduces E."""
    np.savetxt(tmp_path / "props.txt", [100.0, 0.3])
    np.savetxt(tmp_path / "state.txt", [0.0])
    toml = f"""
[Properties]
    temperature = 298
    [Properties.Matl_Props]
        floc = "props.txt"
        num_props = 2
    [Properties.State_Vars]
        floc = "state.txt"
        num_vars = 1
[BCs]
    essential_ids = [1, 2, 3, 4]
    essential_comps = [3, 1, 2, 3]
    essential_vals = [0.0,0.0,0.0, 0.0,0.0,0.0, 0.0,0.0,0.0, 0.0,0.0,0.001]
[Model]
    mech_type = "umat"
    cp = false
    [Model.UMAT]
        library = "{LIB}"
[Time]
    [Time.Fixed]
        dt = 0.5
        t_final = 2.0
[Visualizations]
    avg_stress_fname = "umat_stress.txt"
[Solvers]
    assembly = "EA"
    rtmodel = "TPU"
    [Solvers.NR]
        iter = 10
        rel_tol = 1e-7
        abs_tol = 1e-12
    [Solvers.Krylov]
        iter = 500
        rel_tol = 1e-10
        abs_tol = 1e-30
        solver = "PCG"
[Mesh]
    ref_ser = 0
    p_refinement = 1
    type = "auto"
    [Mesh.Auto]
        length = [1.0, 1.0, 1.0]
        ncuts = [2, 2, 2]
"""
    path = tmp_path / "umat_case.toml"
    path.write_text(toml)
    from exaconstit_tpu.driver import Simulation, parse_options

    opt = parse_options(str(path))
    sim = Simulation(opt, workdir=str(tmp_path))
    sim.run(verbose=False)
    s = np.atleast_2d(np.loadtxt(tmp_path / "umat_stress.txt"))
    # uniaxial stress: sigma_zz = E * eps, lateral ~ 0
    eps = 1e-3 * 0.5 * np.arange(1, len(s) + 1)
    np.testing.assert_allclose(s[:, 2], 100.0 * eps, rtol=2e-3)
    assert np.abs(s[:, :2]).max() < 1e-6
