"""Implicit per-point elasto-viscoplastic crystal update ("evptn").

This is the TPU-native re-design of the per-quadrature-point solve inside
ExaCMech's ``getResponseECM`` (called from src/mechanics_ecmech.cpp:176-186)
— the hottest kernel of the whole application (SURVEY.md section 3.4).

Model (lattice-frame, updated-Lagrangian, velocity-driven):

* unknowns per point: end-of-step deviatoric elastic strain ``e`` (vecd, 5)
  and lattice-rotation increment exponential-map vector ``xi`` (3);
* backward-Euler residual::

    r_e  = e_end - e_n + dt*(Dp(tau(e_end), h) - dev(D)_lat)
    r_xi = xi - dt*(W_lat - Wp(tau(e_end), h))

  with lattice-frame kinematics D_lat = R_end^T D R_end (R_end from the
  quaternion update q_end = q_n * exp(xi/2)), slip-system resolved shears
  ``tau_s = (C_dev e) . P_s``, plastic flow ``Dp = sum_s gdot_s P_s``,
  plastic spin ``Wp = sum_s gdot_s Q_s``;
* hardness ``h`` is staggered: (solve (e, xi) | h) then implicit h-update
  from the converged slip rates, iterated to a fixed point;
* the solver is a batched trust-region dogleg (SNLS-equivalent) vmapped
  over all points;
* the consistent tangent d(sigma)/d(delta_eps) comes from the
  implicit-function theorem at the solution, plus the EOS bulk term —
  returned as the 6x6 matrix in svec ordering with engineering shear
  convention expected by the FEM integrators
  (src/mechanics_integrators.cpp:95-156 and the reference's ddsdde
  transpose contract, src/mechanics_ecmech.cpp:159-170).

Everything is a pure function of arrays -> jit/vmap/shard_map friendly.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..solvers.dogleg import dogleg_solve
from ..solvers.linalg_small import solve_dense
from ..utils import tensors as tn
from .elasticity import Elasticity
from .eos import EosConst
from .slip_geom import SlipGeom

# svec <-> vecd linear maps used for the tangent assembly.
# M_SVEC_FROM_VECD[:, k] = svec components of basis tensor B_k
_B = tn.BASIS_DEV
M_SVEC_FROM_VECD = np.stack(
    [[_B[k, 0, 0], _B[k, 1, 1], _B[k, 2, 2],
      _B[k, 1, 2], _B[k, 0, 2], _B[k, 0, 1]] for k in range(5)], axis=1)
# M_VECD_FROM_SVEC_ENG[k, :] maps an engineering-shear strain svec
# [e11,e22,e33,2e23,2e13,2e12] to vecd(dev(eps)).
M_VECD_FROM_SVEC_ENG = np.stack(
    [[_B[k, 0, 0], _B[k, 1, 1], _B[k, 2, 2],
      _B[k, 1, 2], _B[k, 0, 2], _B[k, 0, 1]] for k in range(5)], axis=0)

IDENT_VOL = np.array([1.0, 1.0, 1.0, 0.0, 0.0, 0.0])


@dataclasses.dataclass(frozen=True)
class EvptnModel:
    """A crystal model = slip geometry + elasticity + kinetics + EOS."""

    slip: SlipGeom
    elast: Elasticity
    kinetics: object  # VocePL | KMBalD
    eos: EosConst
    solver_tol: float = 1e-10
    solver_max_iter: int = 100
    stagger_iters: int = 3  # staggered hardness passes

    @property
    def nslip(self):
        return self.slip.nslip

    @property
    def n_h(self):
        return self.kinetics.n_h


def _residual(model: EvptnModel, x, h, dt, d_vecd_sm, w_vec_sm, e_n, q_n,
              temp_k):
    """The 8-dim backward-Euler residual at one point."""
    e_end = x[:5]
    xi = x[5:]
    dq = tn.expmap_to_quat(xi)
    q_end = tn.quat_multiply(q_n, dq)
    r_end = tn.quat_to_rmat(q_end)
    d_lat = tn.rotate_vecd(r_end.T, d_vecd_sm)
    w_lat = r_end.T @ w_vec_sm

    s_lat = model.elast.stress_vecd(e_end)  # deviatoric Kirchhoff, lattice
    P = jnp.asarray(model.slip.P)  # (S, 5)
    Q = jnp.asarray(model.slip.Q)  # (S, 3)
    taus = P @ s_lat  # (S,)
    gd = model.kinetics.gdots(taus, h, temp_k)  # (S,)
    dp = gd @ P  # (5,)
    wp = gd @ Q  # (3,)

    r_e = e_end - e_n + dt * (dp - d_lat)
    r_xi = xi - dt * (w_lat - wp)
    return jnp.concatenate([r_e, r_xi])


def _solve_point(model: EvptnModel, dt, d_vecd_sm, w_vec_sm, e_n, q_n, h_n,
                 temp_k):
    """Staggered (e,xi) dogleg solve + implicit hardness update, one point."""

    def solve_exi(h):
        def rj(x):
            r = _residual(model, x, h, dt, d_vecd_sm, w_vec_sm, e_n, q_n,
                          temp_k)
            J = jax.jacfwd(lambda y: _residual(
                model, y, h, dt, d_vecd_sm, w_vec_sm, e_n, q_n, temp_k))(x)
            return r, J

        x0 = jnp.concatenate([e_n, jnp.zeros(3, dtype=e_n.dtype)])
        return dogleg_solve(rj, x0, tol=model.solver_tol,
                            max_iter=model.solver_max_iter)

    def gdots_of(x, h):
        s_lat = model.elast.stress_vecd(x[:5])
        taus = jnp.asarray(model.slip.P) @ s_lat
        return model.kinetics.gdots(taus, h, temp_k)

    x0 = jnp.concatenate([e_n, jnp.zeros(3, dtype=e_n.dtype)])

    def stagger_body(_, carry):
        x, h, iters_total, converged = carry
        x, ok, iters, _ = solve_exi(h)
        gd = gdots_of(x, h)
        h = model.kinetics.update_h(h_n, gd, dt, temp_k)
        return (x, h, iters_total + iters,
                jnp.logical_and(converged, ok))

    # fori_loop so the dogleg graph is traced/compiled once, not per pass
    x, h, iters_total, converged = jax.lax.fori_loop(
        0, model.stagger_iters,
        stagger_body,
        (x0, h_n, jnp.asarray(0), jnp.asarray(True)))
    return x, h, iters_total, converged


def point_update(model: EvptnModel, dt, d_vecd_sm, w_vec_sm, v0, v1, e_int_n,
                 e_n, q_n, h_n, temp_k, compute_tangent=True):
    """Full constitutive update at one point (vmap over points).

    Inputs are the kernel_setup quantities of the reference wrapper
    (src/mechanics_ecmech.cpp:22-100): deviatoric deformation rate (vecd),
    spin (wvec), relative volumes v0 -> v1, plus beginning-of-step state.

    Returns a dict of end-of-step state, stress, tangent, diagnostics.
    """
    x, h_end, iters, ok = _solve_point(model, dt, d_vecd_sm, w_vec_sm, e_n,
                                       q_n, h_n, temp_k)
    e_end = x[:5]
    xi = x[5:]
    q_end = tn.normalize_quat(tn.quat_multiply(q_n, tn.expmap_to_quat(xi)))
    r_end = tn.quat_to_rmat(q_end)

    s_lat = model.elast.stress_vecd(e_end)
    P = jnp.asarray(model.slip.P)
    taus = P @ s_lat
    gd = model.kinetics.gdots(taus, h_end, temp_k)
    dp_lat = gd @ P

    # stress outputs: Cauchy deviator in the sample frame + pressure
    s_sm_vecd = tn.rotate_vecd(r_end, s_lat) / v1
    pressure = model.eos.pressure(v1, e_int_n)

    # diagnostics / A-slots
    shrate_eff = tn.vecd_deff(dp_lat)
    deff = tn.vecd_deff(d_vecd_sm)
    pl_work_rate = jnp.sum(taus * gd) / v1  # Cauchy-consistent
    flow_str = pl_work_rate / jnp.maximum(deff, 1e-30)

    # internal-energy update (per unit reference volume); inert when the
    # Grüneisen parameter is zero, as in all reference test cases.
    e_int = e_int_n + dt * pl_work_rate * v1 - pressure * (v1 - v0)

    out = dict(e_end=e_end, q_end=q_end, h_end=h_end, gdots=gd,
               s_vecd_sm=s_sm_vecd, pressure=pressure, e_int=e_int,
               shrate_eff=shrate_eff, flow_str=flow_str, iters=iters,
               converged=ok)

    if compute_tangent:
        out["tangent"] = _consistent_tangent(
            model, x, h_end, dt, d_vecd_sm, w_vec_sm, e_n, q_n, v1, temp_k)
    return out


def _consistent_tangent(model, x_sol, h, dt, d_vecd_sm, w_vec_sm, e_n, q_n,
                        v1, temp_k):
    """6x6 d(sigma_svec)/d(delta_eps_svec_eng) via the implicit-function
    theorem at the converged solution (hardness frozen)."""

    def resid(x, d):
        return _residual(model, x, h, dt, d, w_vec_sm, e_n, q_n, temp_k)

    def stress_sm(x):
        e_end = x[:5]
        xi = x[5:]
        q_end = tn.quat_multiply(q_n, tn.expmap_to_quat(xi))
        r_end = tn.quat_to_rmat(q_end)
        return tn.rotate_vecd(r_end, model.elast.stress_vecd(e_end)) / v1

    J = jax.jacfwd(lambda y: resid(y, d_vecd_sm))(x_sol)  # (8, 8)
    dR_dd = jax.jacfwd(lambda d: resid(x_sol, d))(d_vecd_sm)  # (8, 5)
    dx_dd = -solve_dense(J, dR_dd)  # (8, 5)
    ds_dx = jax.jacfwd(stress_sm)(x_sol)  # (5, 8)
    ds_dd = ds_dx @ dx_dd  # (5, 5) per unit deformation *rate*

    Ms = jnp.asarray(M_SVEC_FROM_VECD)
    Me = jnp.asarray(M_VECD_FROM_SVEC_ENG)
    c_dev = Ms @ (ds_dd / dt) @ Me  # per unit strain increment
    m = jnp.asarray(IDENT_VOL)
    k_eff = model.eos.dpressure_dvolstrain(v1)
    return c_dev + k_eff * jnp.outer(m, m)


def batched_update(model: EvptnModel, dt, d_vecd_sm, w_vec_sm, v0, v1,
                   e_int_n, e_n, q_n, h_n, temp_k, compute_tangent=True):
    """vmap of point_update over a flat batch of points."""
    fn = partial(point_update, model, compute_tangent=compute_tangent)
    return jax.vmap(
        lambda a, b, c, d2, e, f, g, h2: fn(dt, a, b, c, d2, e, f, g, h2,
                                            temp_k)
    )(d_vecd_sm, w_vec_sm, v0, v1, e_int_n, e_n, q_n, h_n)
