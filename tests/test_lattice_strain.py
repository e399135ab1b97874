"""Lattice-strain (simulated diffraction) post-processing tests.

Covers the reference's scripts/postprocessing chain
(adios2_extraction.py -> strain_Xtal_to_Sample.py ->
calc_lattice_strain.py) re-implemented without HEXRD in
scripts/postprocessing/.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PP = os.path.join(REPO, "scripts", "postprocessing")
sys.path.insert(0, PP)


def test_fiber_distance_basics():
    from xtal_util import (cubic_symmetries, distance_to_fiber,
                           quat_of_angle_axis)

    qsym = cubic_symmetries()
    assert qsym.shape == (24, 4)
    ident = np.array([[1.0, 0, 0, 0]])
    # [001] fiber contains the identity; so does [100] by cubic symmetry
    for c in ([0, 0, 1], [1, 0, 0], [0, 1, 0]):
        d = distance_to_fiber(c, [0, 0, 1], ident, qsym)
        assert abs(d[0]) < 1e-12
    # rotating 10 deg about x moves [001] 10 deg off the z fiber
    q = quat_of_angle_axis(np.radians(10.0), [1, 0, 0])[None]
    d = distance_to_fiber([0, 0, 1], [0, 0, 1], q, qsym)
    np.testing.assert_allclose(np.degrees(d[0]), 10.0, atol=1e-9)
    # the [111] fiber: orientation rotating [111]/|.| onto z lies on it
    v = np.array([1.0, 1.0, 1.0]) / np.sqrt(3.0)
    axis = np.cross(v, [0, 0, 1.0])
    ang = np.arccos(v @ [0, 0, 1.0])
    q = quat_of_angle_axis(ang, axis)[None]
    d = distance_to_fiber([1, 1, 1], [0, 0, 1], q, qsym)
    assert abs(d[0]) < 1e-9


def test_pipeline_synthetic(tmp_path):
    from strain_xtal_to_sample import convert_step
    from calc_lattice_strain import lattice_strains
    from xtal_util import quat_of_angle_axis

    raw = tmp_path / "raw"
    sdirs = tmp_path / "strain"
    raw.mkdir(), sdirs.mkdir()
    # element 0: identity (on the 001 z-fiber); element 1: [111] onto z;
    # element 2: 30 deg about x (off both fibers beyond 5 deg)
    v = np.array([1.0, 1, 1]) / np.sqrt(3)
    axis = np.cross(v, [0, 0, 1.0])
    ang = float(np.arccos(v @ [0, 0, 1.0]))
    quats = np.stack([
        [1.0, 0, 0, 0],
        quat_of_angle_axis(ang, axis),
        quat_of_angle_axis(np.radians(30.0), [1, 0, 0]),
    ])
    # crystal-frame strain: pure e33 = 1e-3 for el 0; el 1 gets a strain
    # which in the SAMPLE frame is e33 = 2e-3 (rotate it back to crystal)
    from xtal_util import rmat_of_quat
    R1 = rmat_of_quat(quats[1])
    T_s = np.diag([0.0, 0.0, 2e-3])
    T_c = R1.T @ T_s @ R1
    strain_c = np.stack([
        [0, 0, 1e-3, 0, 0, 0],
        [T_c[0, 0], T_c[1, 1], T_c[2, 2], T_c[1, 2], T_c[0, 2], T_c[0, 1]],
        [0, 0, 5e-3, 0, 0, 0],
    ])
    np.savetxt(raw / "raw_LatticeOrientation_00.txt", quats)
    np.savetxt(raw / "raw_ElementVolume_00.txt", np.ones(3))
    np.savetxt(raw / "raw_XtalElasticStrain_00.txt", strain_c)
    out = convert_step(quats, strain_c)
    np.savetxt(sdirs / "SampleElasticStrain_00.txt", out)

    ls, counts, steps = lattice_strains(
        str(raw), str(sdirs), [[1, 1, 1], [2, 0, 0]], [0, 0, 1],
        distance_deg=5.0)
    # 200-fiber: only element 0; projected strain = its sample e33 = 1e-3
    assert counts[0, 1] == 1
    np.testing.assert_allclose(ls[0, 1], 1e-3, rtol=1e-12)
    # 111-fiber: only element 1; its sample-frame e33 = 2e-3
    assert counts[0, 0] == 1
    np.testing.assert_allclose(ls[0, 0], 2e-3, rtol=1e-10)


@pytest.mark.slow
def test_pipeline_from_simulation(tmp_path):
    """Full chain from a light_up run's HDF5 data collection."""
    data = "/root/reference/test/data"
    toml = f"""
[Properties]
    temperature = 298
    [Properties.Matl_Props]
        floc = "{data}/props_cp_voce.txt"
        num_props = 17
    [Properties.State_Vars]
        floc = "{data}/state_cp_voce.txt"
        num_vars = 24
    [Properties.Grain]
        ori_floc = "{data}/voce_quats.ori"
        ori_state_var_loc = 9
        ori_stride = 4
        num_grains = 500
        ori_type = "quat"
        grain_floc = "{data}/grains.txt"
[BCs]
    essential_ids = [1, 2, 3, 4]
    essential_comps = [3, 1, 2, 3]
    essential_vals = [0.0,0.0,0.0, 0.0,0.0,0.0, 0.0,0.0,0.0, 0.0,0.0,0.001]
[Model]
    mech_type = "exacmech"
    cp = true
    [Model.ExaCMech]
        xtal_type = "fcc"
        slip_type = "powervoce"
[Time]
    [Time.Fixed]
        dt = 0.1
        t_final = 0.2
[Visualizations]
    steps = 1
    visualization = true
    light_up = true
    adios2 = true
    floc = "./lightup_run"
    avg_stress_fname = "ls_stress.txt"
[Solvers]
    assembly = "EA"
    rtmodel = "TPU"
    [Solvers.NR]
        iter = 20
        rel_tol = 1e-5
        abs_tol = 1e-10
    [Solvers.Krylov]
        iter = 300
        rel_tol = 1e-7
        abs_tol = 1e-27
        solver = "PCG"
[Mesh]
    ref_ser = 0
    type = "auto"
    [Mesh.Auto]
        length = [1.0, 1.0, 1.0]
        ncuts = [3, 3, 3]
"""
    # grains.txt maps 124 elems of the refined 5^3 mesh; for the 3^3 mesh
    # just reuse the first 27 entries
    import numpy as np
    g = np.loadtxt(os.path.join(data, "grains.txt"))[:27]
    np.savetxt(tmp_path / "grains27.txt", g)
    toml = toml.replace(f'grain_floc = "{data}/grains.txt"',
                        'grain_floc = "grains27.txt"')
    p = tmp_path / "lightup.toml"
    p.write_text(toml)

    from exaconstit_tpu.driver import Simulation, parse_options
    opt = parse_options(str(p))
    sim = Simulation(opt, workdir=str(tmp_path))
    sim.run(verbose=False)

    h5 = tmp_path / "lightup_run.h5"
    assert h5.exists()
    out = tmp_path / "lattice_strains.txt"
    subprocess.run(
        [sys.executable, os.path.join(PP, "calc_lattice_strain.py"),
         "--h5", str(h5), "--out", str(out), "--hkl", "111", "200",
         "--distance", "15"], check=True, cwd=str(tmp_path))
    ls = np.atleast_2d(np.loadtxt(out))
    assert ls.shape[1] == 2
    # tensile elastic lattice strains along z, order of the applied strain
    assert (ls > 1e-5).all() and (ls < 5e-3).all()


def test_orientation_statistics():
    """quat_mean / fundamental region / misorientation spread math."""
    import xtal_util as xu

    rng = np.random.default_rng(5)
    qsym = xu.cubic_symmetries()

    # a tight cloud around a random center: mean recovers the center and
    # the spread equals the RMS misorientation angle
    ax = rng.normal(size=3)
    center = xu.quat_of_angle_axis(0.7, ax)
    angles = np.deg2rad(rng.uniform(0.2, 2.0, size=200))
    cloud = []
    for a in angles:
        d = xu.quat_of_angle_axis(a, rng.normal(size=3))
        cloud.append(xu.quat_prod(center, d))
    cloud = np.asarray(cloud)

    mean = xu.quat_mean(cloud)
    dot = abs(float(np.dot(mean, center)))
    assert dot > np.cos(np.deg2rad(0.5) / 2)  # within half a degree

    # symmetry reduction: applying a random cubic symmetry to each quat
    # must not change misorientation angles
    ang0, _ = xu.misorientation(center, cloud, qsym)
    scram = xu.quat_prod(cloud, qsym[rng.integers(0, 24, len(cloud))])
    ang1, _ = xu.misorientation(center, scram, qsym)
    np.testing.assert_allclose(ang0, ang1, atol=1e-10)
    np.testing.assert_allclose(ang0, angles, atol=1e-10)

    gids, spread = xu.misorientation_spread(
        cloud, np.ones(len(cloud)), np.ones(len(cloud), dtype=int), qsym)
    rms = np.sqrt(np.mean(angles ** 2))
    assert gids.tolist() == [1]
    np.testing.assert_allclose(spread[0], rms, rtol=0.02)
