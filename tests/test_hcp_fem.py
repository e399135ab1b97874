"""HCP MTSDD end-to-end through the full driver (round-4 verdict item 7).

The reference exercises HCP through the Stage3 workflow
(/root/reference/workflows/Stage3/) with velocity-gradient
(constant-strain-rate) loading; there is no HCP golden in test/data, so
this gates on committed PHYSICAL invariants instead of a curve:

  1. the 95-prop per-slip parameter layout (c_1, g_0, s per system —
     scripts/ecmech_prop_file.py ordering, mechanics_ecmech.hpp HCP
     typedefs KinKMBalDDHCPModel) builds and runs through the real
     TOML -> Simulation path;
  2. slip-family activity ordering: soft basal+prismatic systems carry
     more shear than hard pyramidal <c+a> ones under z-axis extension;
  3. hardening monotonicity: the CRSS never decreases from its initial
     value and strictly increases once flow develops;
  4. the flow stress is bounded by the elastic estimate (szz < c33*eps)
     and sits well below the elastic line at the final step
     (plasticity developed), while exceeding the soft-family yield
     estimate (non-trivial flow).
"""

import os

import numpy as np
import pytest

DATA = "/root/reference/test/data"

TOML = """
Version = "0.6.0"
[Properties]
    temperature = 298
    [Properties.Matl_Props]
        floc = "props_hcp_mts.txt"
        num_props = 95
    [Properties.State_Vars]
        floc = "state_hcp_mts.txt"
        num_vars = 36
    [Properties.Grain]
        ori_state_var_loc = 9
        ori_stride = 4
        ori_type = "quat"
        num_grains = 8
        ori_floc = "hcp_quats.ori"
        grain_floc = "grains8.txt"
[BCs]
    constant_strain_rate = true
    essential_ids = [1, 2, 3, 4]
    essential_comps = [-3, -1, -2, -3]
    essential_vel_grad = [[-0.0005, 0.0, 0.0],
                          [0.0, -0.0005, 0.0],
                          [0.0, 0.0, 0.001]]
[Model]
    mech_type = "exacmech"
    cp = true
    [Model.ExaCMech]
        xtal_type = "hcp"
        slip_type = "mtsdd"
[Time]
    [Time.Fixed]
        dt = 0.25
        t_final = 2.0
[Visualizations]
    steps = 100
    visit = false
    floc = "./hcp_p"
    avg_stress_fname = "hcp_stress.txt"
[Solvers]
    assembly = "EA"
    rtmodel = "CPU"
    [Solvers.NR]
        iter = 30
        rel_tol = 1e-5
        abs_tol = 1e-8
    [Solvers.Krylov]
        iter = 200
        rel_tol = 1e-7
        abs_tol = 1e-27
        solver = "PCG"
[Mesh]
    type = "auto"
    [Mesh.Auto]
        length = [1.0, 1.0, 1.0]
        ncuts = [2, 2, 2]
"""

# Ti-like HCP MTSDD, per-slip c_1/g_0/s (24 each), num_props = 95
# (layout: tests/test_material.py::test_hcp_mtsdd_per_slip_props checks
# the same ordering at the point level)
C_ELAST = (162.4, 92.0, 69.0, 180.7, 46.7)  # c11 c12 c13 c33 c44 (GPa-ish)
GO_SOFT, GO_HARD = 4e-3, 12e-3


def _props():
    S = 24
    go = np.full(S, GO_HARD)
    go[:6] = GO_SOFT  # basal (3) + prismatic (3) families soft
    s = np.full(S, 0.12)
    s[:6] = 0.06
    c1 = np.full(S, 1.9e3)
    return np.concatenate([
        [8.92e-6, 385.0, 1e-10],
        list(C_ELAST),
        [46.0, 300.0], c1,
        [4e-4, 1.0, 1.0, 1.0, 1.0, 3e-2],
        go, s,
        [3e-4, 5e-5, 0.1, 1e-2, 9e-4],
        [0.0, -1.1556e5],
    ])


def test_hcp_mtsdd_fem_end_to_end(tmp_path):
    rng = np.random.default_rng(11)
    q = rng.normal(size=(8, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    np.savetxt(tmp_path / "hcp_quats.ori", q)
    np.savetxt(tmp_path / "grains8.txt", np.arange(1, 9))
    np.savetxt(tmp_path / "props_hcp_mts.txt", _props())
    np.savetxt(tmp_path / "state_hcp_mts.txt", np.zeros(36))
    (tmp_path / "case.toml").write_text(TOML)

    from exaconstit_tpu.driver import Simulation, parse_options

    opt = parse_options(str(tmp_path / "case.toml"))
    sim = Simulation(opt, workdir=str(tmp_path))
    model = sim.model
    assert model.nslip == 24
    assert np.asarray(model.evptn.kinetics.go).shape == (24,)
    sim.run(verbose=False)

    stress = np.atleast_2d(np.loadtxt(tmp_path / "hcp_stress.txt"))
    assert stress.shape[0] == 8 and np.isfinite(stress).all()
    szz = stress[:, 2]
    eps = 1e-3 * 0.25 * np.arange(1, 9)

    # (4) elastic bound + developed plasticity + non-trivial flow
    assert np.all(szz < C_ELAST[3] * eps), "stress above the elastic bound"
    assert szz[-1] < 0.5 * C_ELAST[3] * eps[-1], \
        "no plastic relaxation by 0.2% strain"
    assert szz[-1] > 2.0 * GO_SOFT, "flow stress below the soft-family CRSS"
    assert szz[-1] >= szz[0] * 0.5, "stress collapsed"

    # state-based invariants (volume-uniform mesh: plain mean is the
    # volume average)
    state = sim.system.from_state(sim.state)[:sim.system.fes.num_elems]
    state = state.reshape(-1, state.shape[-1])  # (npts, nsv)
    gd = np.abs(state[:, model.ind_gdot:model.ind_gdot + 24])
    # (2) soft basal+prism dominate hard pyramidal activity
    assert gd[:, :6].sum() > gd[:, 6:].sum(), \
        "hard pyramidal systems out-shear the soft basal/prismatic ones"
    assert gd.sum() > 0.0, "no slip activity at 0.2% strain"

    # (3) hardening monotone: h(t_final) >= h(0) everywhere, > on average
    h_end = state[:, model.IND_HARD]
    h0 = float(np.asarray(model.init_state(q[:1])[0, model.IND_HARD]))
    assert np.all(h_end >= h0 * (1.0 - 1e-12))
    assert h_end.mean() > h0, "no hardening after developed flow"
