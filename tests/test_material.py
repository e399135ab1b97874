"""Material-layer tests: slip geometry, elasticity, evptn point solve.

Analogous in role to the reference's single-point validation of ExaCMech
(SURVEY.md section 7 phase 2): elastic limits, consistent tangent, yield
level from power-law kinetics, Voce hardening evolution.
"""

import jax
import os
import jax.numpy as jnp
import numpy as np
import pytest

from exaconstit_tpu.config.options import parse_options
from exaconstit_tpu.models import slip_geom
from exaconstit_tpu.models.ecmech import build_model

VOCE_TOML = "/root/reference/test/data/voce_full.toml"


@pytest.fixture(scope="module")
def voce_model():
    opt = parse_options(VOCE_TOML)
    props = np.loadtxt(opt.abspath(opt.props_file))
    return build_model(opt, props), props


def test_slip_geometry():
    for geom, n in [(slip_geom.fcc12(), 12), (slip_geom.bcc12(), 12),
                    (slip_geom.hcp24(), 24)]:
        assert geom.nslip == n
        # Schmid tensors are deviatoric unit-ish: |P|^2 = 1/2 for unit m,n
        norms = np.sum(geom.P ** 2, axis=1)
        np.testing.assert_allclose(norms, 0.5, atol=1e-12)
        # skew part: |Q|^2 = 1/4 (wvec of skew(m x n))
        qn = np.sum(geom.Q ** 2, axis=1)
        np.testing.assert_allclose(qn, 0.25, atol=1e-12)


def test_elastic_response_and_tangent(voce_model):
    model, props = voce_model
    c11, c12, c44 = props[3], props[4], props[5]
    K = (c11 + 2 * c12) / 3.0
    N = 4
    state = jnp.asarray(model.init_state(np.tile([[1.0, 0, 0, 0]], (N, 1))))
    L = jnp.asarray(np.tile(np.diag([0.0, 0.0, 1e-3]), (N, 1, 1)))
    stress, st, tg = model.model_setup(0.005, L, state)
    eps = 5e-6
    np.testing.assert_allclose(np.asarray(stress[0, 0]), c12 * eps, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(stress[0, 2]), c11 * eps, rtol=1e-4)
    np.testing.assert_allclose(float(stress[0, :3].mean()), K * eps,
                               rtol=1e-4)
    # consistent tangent at an elastic point = cubic stiffness (eng shear)
    expect = np.zeros((6, 6))
    expect[:3, :3] = c12
    np.fill_diagonal(expect[:3, :3], c11)
    expect[3, 3] = expect[4, 4] = expect[5, 5] = c44
    np.testing.assert_allclose(np.asarray(tg[0]), expect, atol=5e-3)


def test_elastic_rotated_orientation(voce_model):
    """Cubic elasticity transforms correctly for a rotated grain."""
    model, props = voce_model
    rng = np.random.default_rng(7)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    N = 4
    state = jnp.asarray(model.init_state(np.tile(q, (N, 1))))
    L = jnp.asarray(np.tile(np.diag([0.0, 0.0, 1e-3]), (N, 1, 1)))
    stress, _, tg = model.model_setup(0.001, L, state)
    # analytic: rotate strain to crystal frame, apply cubic C, rotate back
    from exaconstit_tpu.utils import tensors as tn
    R = np.asarray(tn.quat_to_rmat(jnp.asarray(q)))
    eps = np.diag([0.0, 0.0, 1e-6])
    eps_c = R.T @ eps @ R
    c11, c12, c44 = props[3], props[4], props[5]
    sig_c = np.zeros((3, 3))
    for i in range(3):
        sig_c[i, i] = c11 * eps_c[i, i] + c12 * (np.trace(eps_c) - eps_c[i, i])
    for i in range(3):
        for j in range(3):
            if i != j:
                sig_c[i, j] = 2 * c44 * eps_c[i, j]
    sig = R @ sig_c @ R.T
    got = np.asarray(stress[0])
    want = np.array([sig[0, 0], sig[1, 1], sig[2, 2], sig[1, 2], sig[0, 2],
                     sig[0, 1]])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-12)


def test_plastic_flow_and_hardening(voce_model):
    """Drive into fully-developed flow; check the power-law operating point
    and Voce hardening evolution."""
    model, props = voce_model
    xm, gdot0 = props[7], props[8]
    N = 4
    state = jnp.asarray(model.init_state(np.tile([[1.0, 0, 0, 0]], (N, 1))))
    # pure deviatoric uniaxial-rate loading (isochoric)
    Lm = np.diag([-5e-4, -5e-4, 1e-3])
    L = jnp.asarray(np.tile(Lm, (N, 1, 1)))
    setup = jax.jit(lambda dt, d, s: model.model_setup(dt, d, s,
                                                       compute_tangent=False))
    st = state
    for _ in range(30):
        stress, st, _ = setup(0.1, L, st)
    st = np.asarray(st)
    g = st[0, 13]
    taus_ratio_max = np.abs(
        np.asarray(model.evptn.slip.P @ model.evptn.elast.stress_vecd(
            jnp.asarray(st[0, 4:9])))).max() / g
    # fully-developed flow: max resolved stress ratio ~ (gdot_ss/gdot0)^xm,
    # gdot_ss within a factor ~10 of the applied rate
    lo = (1e-5 / gdot0) ** xm
    hi = (1e-2 / gdot0) ** xm
    assert lo < taus_ratio_max < hi, taus_ratio_max
    # hardness grew from g0 toward gs0
    assert props[10] < g < props[11]
    # plastic work and effective shear accumulated, volume ~ constant
    assert st[0, 2] > 0.0
    assert st[0, 1] > 0.0
    np.testing.assert_allclose(st[0, 26], 1.0, atol=1e-12)
    # stress stays finite and deviatorically bounded by ~ M * gs
    assert np.abs(stress[0]).max() < 0.5


def test_consistent_tangent_fd(voce_model):
    """IFT tangent vs central finite differences of the full point update.

    The tangent couples (elastic strain, lattice rotation, hardness); in
    the fully-coupled hardness mode it must match central differences of
    the complete point update tightly.  (The default lagged-hardness mode
    intentionally pairs this tangent with a slightly different map for
    outer-Newton robustness — see models/evptn.py.)
    """
    import dataclasses
    model, _ = voce_model
    model = dataclasses.replace(
        model, evptn=dataclasses.replace(model.evptn,
                                         hardness_mode="coupled"))
    N = 4
    state = jnp.asarray(model.init_state(np.tile([[1.0, 0, 0, 0]], (N, 1))))
    Lm = np.diag([-5e-4, -5e-4, 1e-3])
    L = jnp.asarray(np.tile(Lm, (N, 1, 1)))
    setup = jax.jit(lambda dt, d, s, t: model.model_setup(
        dt, d, s, compute_tangent=t), static_argnums=3)
    st = state
    for _ in range(15):
        stress, st, _ = setup(0.1, L, st, False)
    _, _, tg = setup(0.1, L, st, True)
    tg = np.asarray(tg[0])
    # symmetric
    np.testing.assert_allclose(tg, tg.T, atol=1e-8)
    dt = 0.1
    fd = np.zeros((6, 6))
    eps = 1e-9
    # columns: perturb strain increments via L entries (eng shear pairs)
    pert = [(0, 0), (1, 1), (2, 2), (1, 2), (0, 2), (0, 1)]
    for c, (i, j) in enumerate(pert):
        dL = np.zeros((3, 3))
        if i == j:
            dL[i, j] = eps / dt
        else:  # engineering shear split symmetrically
            dL[i, j] = dL[j, i] = 0.5 * eps / dt
        sp, _, _ = setup(dt, jnp.asarray(np.tile(Lm + dL, (N, 1, 1))), st,
                         False)
        sm, _, _ = setup(dt, jnp.asarray(np.tile(Lm - dL, (N, 1, 1))), st,
                         False)
        fd[:, c] = (np.asarray(sp[0]) - np.asarray(sm[0])) / (2 * eps)
    scale = np.abs(fd).max()
    err = np.abs(tg - fd) / scale
    # fully-coupled (e, xi, h) IFT tangent matches FD everywhere
    assert err.max() < 5e-3, err


def test_mtsdd_smoke():
    opt = parse_options("/root/reference/test/data/mtsdd_full.toml")
    props = np.loadtxt(opt.abspath(opt.props_file))
    model = build_model(opt, props)
    assert model.num_state == 28
    N = 4
    state = jnp.asarray(model.init_state(np.tile([[1.0, 0, 0, 0]], (N, 1))))
    L = jnp.asarray(np.tile(np.diag([-5e-4, -5e-4, 1e-3]), (N, 1, 1)))
    st = state
    setup = jax.jit(lambda dt, d, s: model.model_setup(dt, d, s,
                                                       compute_tangent=False))
    for _ in range(10):
        stress, st, _ = setup(0.1, L, st)
    assert np.isfinite(np.asarray(stress)).all()
    assert np.isfinite(np.asarray(st)).all()
    # some plastic activity and dd evolution
    assert float(jnp.abs(st[:, 14:26]).sum()) > 0.0


def test_mtsdd_in625_props_smoke():
    """The reference's second shipped MTS parameter set (IN625, MPa
    units, rho_dd_init = 1: test/data/props_cp_mts_in625.txt) builds and
    integrates with a finite consistent tangent — it takes the
    UNcalibrated structural path (constants differ from the copper test
    set), covering the published-form branch of the KMBalD kinetics."""
    opt = parse_options("/root/reference/test/data/mtsdd_full.toml")
    props = np.loadtxt(
        "/root/reference/test/data/props_cp_mts_in625.txt")
    model = build_model(opt, props)
    assert model.evptn.kinetics.k1 == 100.0  # uncalibrated file values
    N = 4
    state = jnp.asarray(model.init_state(np.tile([[1.0, 0, 0, 0]],
                                                 (N, 1))))
    L = jnp.asarray(np.tile(np.diag([-5e-4, -5e-4, 1e-3]), (N, 1, 1)))
    stress, st, tang = model.model_setup(0.01, L, state)
    assert np.isfinite(np.asarray(stress)).all()
    assert np.isfinite(np.asarray(st)).all()
    assert np.isfinite(np.asarray(tang)).all()


def test_state_layout_matches_reference_convention(voce_model):
    model, _ = voce_model
    m = model.qf_mapping
    assert m["quats"] == (9, 4)
    assert m["gdot"] == (14, 12)
    assert m["hardness"] == (13, 1)
    assert m["rel_vol"] == (26, 1)
    assert m["int_eng"] == (27, 1)
    assert m["elas_strain"] == (4, 5)
    assert model.num_state == 28


def test_hcp_mtsdd_per_slip_props():
    """Reference HCP parameter layout: c_1, g_0 and s are per-slip-system
    (24 values each; scripts/ecmech_prop_file.py documents the ordering),
    num_props = 95.  Build through the factory, check that slip-family
    strength differences steer the slip activity (soft basal systems
    shear more than hard pyramidal ones)."""
    import dataclasses

    from exaconstit_tpu.config.options import parse_options

    opt = parse_options("/root/reference/test/data/mtsdd_full.toml")
    opt = dataclasses.replace(opt) if dataclasses.is_dataclass(opt) else opt
    opt.xtal_type = __import__(
        "exaconstit_tpu.config.options", fromlist=["XtalType"]).XtalType.HCP
    S = 24
    # soft basal+prism (first 6), hard pyramidal
    go = np.full(S, 12e-3)
    go[:6] = 4e-3
    s = np.full(S, 0.12)
    s[:6] = 0.06
    c1 = np.full(S, 1.9e3)
    props = np.concatenate([
        [8.92e-6, 385.0, 1e-10],            # rho0, cvav, tol
        [162.4, 92.0, 69.0, 180.7, 46.7],   # hexagonal elastic
        [46.0, 300.0], c1,
        [4e-4, 1.0, 1.0, 1.0, 1.0, 3e-2],   # tau_a, p, q, gw, gr, wrD
        go, s,
        [3e-4, 5e-5, 0.1, 1e-2, 9e-4],      # k1, k2_0, ninv, gam_o, rho0
        [0.0, -1.1556e5],
    ])
    assert props.shape == (95,)
    from exaconstit_tpu.models.ecmech import build_model
    model = build_model(opt, props)
    assert model.nslip == 24
    assert np.asarray(model.evptn.kinetics.go).shape == (S,)
    N = 3
    rng = np.random.default_rng(5)
    q = rng.normal(size=(N, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    state = jnp.asarray(model.init_state(q))
    L = jnp.asarray(np.tile(np.diag([-5e-4, -5e-4, 1e-3]), (N, 1, 1)))
    st = state
    setup = jax.jit(lambda d, s: model.model_setup(0.2, d, s,
                                                   compute_tangent=False))
    for _ in range(10):  # develop plastic flow well past yield
        stress, st, _ = setup(L, st)
    assert np.isfinite(np.asarray(stress)).all()
    stress, st, tang = model.model_setup(0.2, L, st)
    assert np.isfinite(np.asarray(tang)).all()
    gd = np.abs(np.asarray(st)[:, model.ind_gdot:model.ind_gdot + S])
    assert gd[:, :6].sum() > gd[:, 6:].sum()  # soft families dominate


def test_hcp_mtsdd_smoke():
    """HCP (24 slip systems) with MTSDD kinetics: finite, plastic, stable."""
    import dataclasses

    from exaconstit_tpu.models import elasticity, kinetics, slip_geom
    from exaconstit_tpu.models.ecmech import ECMechModel
    from exaconstit_tpu.models.eos import EosConst
    from exaconstit_tpu.models.evptn import EvptnModel

    props = np.loadtxt("/root/reference/test/data/props_cp_mts.txt")
    elast = elasticity.hexagonal(162.4, 92.0, 69.0, 180.7, 46.7)  # Ti-like
    kin = kinetics.KMBalD.from_props(
        np.concatenate([props[:3], [162.4, 92.0, 69.0, 180.7, 46.7],
                        props[6:22], props[22:]]), n_elastic=5)
    slip = slip_geom.hcp24()
    eos = EosConst(bulk=elast.bulk)
    model = ECMechModel(
        evptn=EvptnModel(slip=slip, elast=elast, kinetics=kin, eos=eos),
        temp_k=300.0, nslip=24, n_h=1)
    assert model.num_state == 40  # 4+5+4+1+24+1+1
    N = 4
    state = jnp.asarray(model.init_state(np.tile([[1.0, 0, 0, 0]], (N, 1))))
    L = jnp.asarray(np.tile(np.diag([-5e-4, -5e-4, 1e-3]), (N, 1, 1)))
    st = state
    setup = jax.jit(lambda dt, d, s: model.model_setup(
        dt, d, s, compute_tangent=False))
    for _ in range(8):
        stress, st, _ = setup(0.1, L, st)
    assert np.isfinite(np.asarray(stress)).all()
    assert float(jnp.abs(st[:, model.ind_gdot:model.ind_gdot + 24]).sum()) \
        > 0.0


def test_order2_simulation_smoke(tmp_path):
    """Quadratic elements end-to-end (27 qpts/elem) on a tiny voce case."""
    import shutil

    src = "/root/reference/test/data"
    for f in ["props_cp_voce.txt", "state_cp_voce.txt", "voce_quats.ori",
              "grains.txt"]:
        shutil.copy(os.path.join(src, f), tmp_path)
    toml = open(os.path.join(src, "voce_full.toml")).read()
    toml = toml.replace("p_refinement = 1", "p_refinement = 2")
    toml = toml.replace("ref_ser = 1", "ref_ser = 0")
    toml = toml.replace("ncuts = [5, 5, 5]", "ncuts = [2, 2, 2]")
    toml = toml.replace('grain_floc = "grains.txt"',
                        'grain_floc = "grains8.txt"')
    toml = toml.replace("[Time]", """[Time]
    [Time.Fixed]
        dt = 0.2
        t_final = 0.4
""")
    # drop the Custom table by renaming it away
    toml = toml.replace("[Time.Custom]", "[Ignored.Custom]")
    np.savetxt(tmp_path / "grains8.txt", np.arange(1, 9))
    (tmp_path / "case.toml").write_text(toml)
    from exaconstit_tpu.driver import Simulation, parse_options

    opt = parse_options(str(tmp_path / "case.toml"))
    assert opt.order == 2
    sim = Simulation(opt, workdir=str(tmp_path))
    assert sim.system.fes.nqpts == 27
    sim.run(verbose=False)
    s = np.atleast_2d(np.loadtxt(tmp_path / opt.avg_stress_fname))
    assert np.isfinite(s).all()
    # elastic-plastic: first step mostly elastic, stress reasonable
    assert 0.01 < s[-1, 2] < 0.08


def test_hcp_taylor_rigid_plastic_consistency():
    """Quantitative HCP check: the implicit point solve must reach the
    rigid-viscoplastic steady state computed by an independent solver.

    With hardening disabled (h0 = 0) and a traceless symmetric velocity
    gradient, the fully-developed stress solves

        sum_s gdot(P_s : sigma) P_s = d        (5-dim, deviatoric)

    independent of the production dogleg/staggered machinery.  c-axis
    extension on HCP activates only the 12 pyramidal <c+a> systems
    (basal and prismatic have zero Schmid factor), so this also pins the
    slip-geometry anisotropy quantitatively.
    """
    from exaconstit_tpu.models import elasticity, kinetics, slip_geom
    from exaconstit_tpu.models.ecmech import ECMechModel
    from exaconstit_tpu.models.eos import EosConst
    from exaconstit_tpu.models.evptn import EvptnModel
    from exaconstit_tpu.utils.tensors import BASIS_DEV, svec_to_vecd

    xm, gdot0, g0 = 0.1, 1.0, 0.01
    kin = kinetics.VocePL(mu=45.0, xm=xm, gdot0=gdot0, h0=0.0, g0=g0,
                          gs0=2 * g0, xms=0.0, gam_s=1.0, hdn_init=g0)
    slip = slip_geom.hcp24()
    elast = elasticity.hexagonal(162.4, 92.0, 69.0, 180.7, 46.7)
    model = ECMechModel(
        evptn=EvptnModel(slip=slip, elast=elast, kinetics=kin,
                         eos=EosConst(bulk=elast.bulk)),
        temp_k=300.0, nslip=24, n_h=1)

    D = np.diag([-5e-4, -5e-4, 1e-3])
    d_vecd = np.einsum("kij,ij->k", BASIS_DEV, D)

    # --- independent rigid-viscoplastic solve (numpy Newton with
    # rate-sensitivity continuation) -----------------------------------
    P = np.asarray(slip.P, dtype=np.float64)
    sig = g0 * d_vecd / np.linalg.norm(d_vecd)
    for xm_c in (1.0, 0.5, 0.25, 0.1):
        for _ in range(80):
            tau = P @ sig
            mag = gdot0 * np.abs(tau / g0) ** (1.0 / xm_c)
            r = P.T @ (np.sign(tau) * mag) - d_vecd
            slope = mag / (xm_c * np.maximum(np.abs(tau), 1e-30))
            J = (P.T * slope) @ P
            step = np.linalg.solve(J, r)
            # cap the tau step to keep the power law in range
            nrm = np.max(np.abs(P @ step))
            sig = sig - step * min(1.0, 0.2 * g0 / max(nrm, 1e-30))
        assert np.linalg.norm(r) < 1e-9 * np.linalg.norm(d_vecd), xm_c

    # basal + prismatic resolved stresses vanish for c-axis extension
    tau = P @ sig
    assert np.max(np.abs(tau[:6])) < 1e-12 * np.max(np.abs(tau))
    assert np.max(np.abs(tau[6:])) > 0.1 * g0

    # --- production implicit solve to steady state ---------------------
    N = 2
    state = jnp.asarray(model.init_state(np.tile([[1.0, 0, 0, 0]], (N, 1))))
    L = jnp.asarray(np.tile(D, (N, 1, 1)))
    setup = jax.jit(lambda dt, d, s: model.model_setup(
        dt, d, s, compute_tangent=False))
    for _ in range(60):
        stress, state, _ = setup(0.25, L, state)
    sv = np.asarray(stress)[0]
    got = np.asarray(svec_to_vecd(jnp.asarray(sv)))
    rel = np.linalg.norm(got - sig) / np.linalg.norm(sig)
    assert rel < 1e-4, (rel, got, sig)
