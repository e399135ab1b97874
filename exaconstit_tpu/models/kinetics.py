"""Slip kinetics and hardening laws.

Equivalents of ExaCMech's kinetics classes (referenced from
src/mechanics_ecmech.hpp:365-463):

* ``VocePL``   — power-law slip + Voce hardening (Kin_FCC_A), optionally
  with a nonlinear Voce exponent (Kin_FCC_AH).  Parameter order follows
  the documented props layout (mechanics_ecmech.hpp:395-405):
  shear modulus, rate sensitivity m, gdot_0, hardening coeff h0,
  initial CRSS g0, CRSS saturation gs0, saturation scaling exponent xms,
  saturation rate coeff gam_s, hdn_init (unused); the NL variant inserts
  the Voce exponent after gs0.
* ``KMBalD``   — single Kocks-Mecking dislocation-density, balanced
  thermally-activated MTS-like slip with phonon drag
  (mechanics_ecmech.hpp:416-459).

All rate functions are smooth jnp expressions so the per-point implicit
solver can differentiate them with JAX AD.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

_TINY = 1e-280  # f64 guard; use _tiny(x) for dtype-aware code paths


def _tiny(x):
    return float(jnp.finfo(x.dtype).tiny)


def _max_log_gdot(x):
    # exp cap keeps ||R||^2 finite during trust-region globalization;
    # f32 needs a much lower cap (exp(80)^2 overflows f32 -> NaN rho)
    return 80.0 if x.dtype == jnp.float64 else 25.0


@dataclasses.dataclass(frozen=True)
class VocePL:
    mu: float
    xm: float
    gdot0: float
    h0: float
    g0: float
    gs0: float
    xms: float
    gam_s: float
    hdn_init: float
    voce_exponent: float = 1.0  # 1 -> linear Voce (Kin_FCC_A)
    # Evolution form: "sat_ratio" -> h0*((gs-h)/(gs-g0))^n * Gamma_dot
    #                 "one_minus" -> h0*(1-h/gs)^n * Gamma_dot
    form: str = "sat_ratio"
    # h integration scheme over the step (linear Voce):
    #   "backward_euler" -> one implicit Euler step (default; calibration
    #       against the reference goldens puts it at the golden files'
    #       6-sig-digit print floor ~7e-6 over the ramped-dt schedule,
    #       while the exact-exponential update drifts to 3e-2 by the
    #       dt=1.0 steps -- ExaCMech's Voce update is backward Euler)
    #   "exponential" -> exact solution of dh/dGamma = a(gs-h), gs frozen
    h_scheme: str = "backward_euler"

    n_h = 1

    @classmethod
    def from_props(cls, props, nonlinear: bool):
        # props = full parameter vector; kinetics block starts at index 6
        # (after rho0, cvav, tol, c11, c12, c44)
        p = np.asarray(props, dtype=float)
        if nonlinear:
            (mu, xm, gdot0, h0, g0, gs0, expo, xms, gam_s, hdn) = \
                (float(v) for v in p[6:16])
        else:
            (mu, xm, gdot0, h0, g0, gs0, xms, gam_s, hdn) = \
                (float(v) for v in p[6:15])
            expo = 1.0
        return cls(mu=mu, xm=xm, gdot0=gdot0, h0=h0, g0=g0, gs0=gs0,
                   xms=xms, gam_s=gam_s, hdn_init=hdn, voce_exponent=expo)

    def init_hardness(self):
        return np.array([self.g0])

    def gdots(self, taus, h, temp_k):
        """Power-law slip rates; h: (..., 1) hardness (CRSS).

        NaN-safe under jacfwd: double-where for the tiny-ratio branch, and a
        linear continuation above the exp cap so the Jacobian never goes
        identically flat during trust-region globalization.
        """
        del temp_k
        g = h[..., 0:1]
        xn = 1.0 / self.xm
        ratio = jnp.abs(taus) / g
        big = ratio > 1e-10
        ratio_safe = jnp.where(big, ratio, 1.0)
        log_gdot = xn * jnp.log(ratio_safe)
        cap = _max_log_gdot(taus)
        capped = jnp.minimum(log_gdot, cap)
        over = jnp.maximum(log_gdot - cap, 0.0)
        gd = jnp.where(big, self.gdot0 * jnp.exp(capped) * (1.0 + over), 0.0)
        return jnp.sign(taus) * gd

    def gdots_slope(self, taus, h, temp_k):
        """(gdots, d gdots / d tau) with the slope in closed form.

        Shape-generic (h broadcasts against taus on the last axis); used
        by the component-major batched engine where reverse/forward AD
        per point would bloat the compiled program.
        """
        del temp_k
        g = h[..., 0:1]
        xn = 1.0 / self.xm
        tau_abs = jnp.abs(taus)
        ratio = tau_abs / g
        big = ratio > 1e-10
        ratio_safe = jnp.where(big, ratio, 1.0)
        log_gdot = xn * jnp.log(ratio_safe)
        cap = _max_log_gdot(taus)
        capped = jnp.minimum(log_gdot, cap)
        over = jnp.maximum(log_gdot - cap, 0.0)
        mag_cap = self.gdot0 * jnp.exp(capped)
        mag = mag_cap * (1.0 + over)
        gd = jnp.where(big, mag, 0.0)
        # d|gd|/d|tau|: below the cap mag_cap*(1+over) == mag and the
        # derivative is xn*mag/tau; above, mag_cap is frozen and only the
        # linear continuation term varies: d = mag_cap * xn / tau.
        slope_mag = jnp.where(log_gdot < cap, xn * mag, xn * mag_cap)
        slope = jnp.where(big, slope_mag / jnp.where(big, tau_abs, 1.0), 0.0)
        return jnp.sign(taus) * gd, slope

    def operating_ratio(self, deff):
        """Estimate of |tau|/g at fully-developed flow at rate ``deff``.

        Used only to construct the implicit solver's initial guess."""
        return jnp.power(jnp.maximum(deff, 1e-12) / self.gdot0, self.xm)

    def _gsat(self, shrate_sum):
        if self.xms == 0.0:
            return jnp.full_like(shrate_sum, self.gs0)
        arg = jnp.maximum(shrate_sum, _TINY) / self.gam_s
        return self.gs0 * jnp.power(arg, self.xms)

    def _hdot(self, h, gs):
        if self.form == "sat_ratio":
            x = (gs - h) / (gs - self.g0)
        else:
            x = 1.0 - h / gs
        x = jnp.maximum(x, 0.0)
        n = self.voce_exponent
        xn = x if n == 1.0 else jnp.power(jnp.maximum(x, _TINY), n)
        return self.h0 * xn

    def h_residual(self, h, h_n, gdots, dt, temp_k):
        """Backward-Euler hardness residual (for the coupled tangent)."""
        del temp_k
        shrate = jnp.sum(jnp.abs(gdots), axis=-1, keepdims=True)
        gs = self._gsat(shrate)
        return h - h_n - self._hdot(h, gs) * shrate * dt

    def update_h_explicit(self, h_n, gdots, dt, temp_k):
        """Forward-Euler hardness update (scheme-identification probe)."""
        del temp_k
        shrate = jnp.sum(jnp.abs(gdots), axis=-1, keepdims=True)
        gs = self._gsat(shrate)
        return h_n + self._hdot(h_n, gs) * shrate * dt

    def update_h(self, h_n, gdots, dt, temp_k):
        """Implicit (backward-Euler) hardness update given converged gdots.

        For the linear Voce form this is solved in closed form; the
        nonlinear form uses a fixed-iteration scalar Newton.
        """
        del temp_k
        shrate = jnp.sum(jnp.abs(gdots), axis=-1, keepdims=True)
        gs = self._gsat(shrate)
        dgam = shrate * dt
        if self.voce_exponent == 1.0:
            if self.form == "sat_ratio":
                a = self.h0 / (gs - self.g0)
            else:
                a = self.h0 / gs
            if self.h_scheme == "backward_euler":
                return (h_n + a * gs * dgam) / (1.0 + a * dgam)
            # exact solution of dh/dGamma = a (gs - h) with gs frozen
            return gs + (h_n - gs) * jnp.exp(-a * dgam)
        h = h_n
        for _ in range(20):
            r = h - h_n - self._hdot(h, gs) * dgam
            if self.form == "sat_ratio":
                x = jnp.maximum((gs - h) / (gs - self.g0), _TINY)
                drdh = 1.0 + dgam * self.h0 * self.voce_exponent * \
                    jnp.power(x, self.voce_exponent - 1.0) / (gs - self.g0)
            else:
                x = jnp.maximum(1.0 - h / gs, _TINY)
                drdh = 1.0 + dgam * self.h0 * self.voce_exponent * \
                    jnp.power(x, self.voce_exponent - 1.0) / gs
            h = h - r / drdh
        return h


@dataclasses.dataclass(frozen=True)
class KMBalD:
    """Kocks-Mecking dislocation-density MTS-like kinetics w/ phonon drag.

    Parameter order (mechanics_ecmech.hpp:444-458): mu_ref, tK_ref,
    c_1 = g_0 b^3/kB [K/stress], tau_a (Peierls), p, q, gam_wo, gam_ro,
    wrD (drag stress), go, s, k1, k2_0, ninv, gam_ro_dd, rho_dd_init.
    """

    mu_ref: float
    tk_ref: float
    c1: float
    tau_a: float
    p: float
    q: float
    gam_wo: float
    gam_ro: float
    wr_d: float
    go: float
    s: float
    k1: float
    k2_0: float
    ninv: float
    gam_ro_dd: float
    rho_dd_init: float
    # density-production exponent a in drho/dGamma = k1 rho^a - k2 rho^b
    # (0.5 = classic Kocks-Mecking sqrt production)
    prod_exponent: float = 0.5
    # density-recovery exponent b (1.0 = classic linear recovery)
    recov_exponent: float = 1.0
    # ExaCMech's KineticsKMBalD<withGAthermal> template flag
    # (matModelEvptn_BCC_A vs FCC_B, referenced from
    # src/mechanics_ecmech.hpp:460-463): BCC screw-dislocation kinetics
    # have the dislocation strength act ATHERMALLY (subtracted from tau)
    # with the Peierls barrier tau_a as the thermally-activated obstacle
    # scale; FCC is the reverse (tau_a athermal, strength normalizes the
    # activation).  Calibrated against mtsdd_bcc_stress.txt.
    g_athermal: bool = False

    n_h = 1

    @classmethod
    def from_props(cls, props, n_elastic: int = 3, g_athermal: bool = False,
                   nslip: int = 12):
        """Parse the kinetics block.

        Two layouts (both in the reference's documented parameter order,
        scripts/ecmech_prop_file.py): scalar (16 kinetics values; FCC and
        BCC, plus the scalar-HCP convenience extension) and per-slip
        (13 + 3*nslip values; HCP, where c_1, g_0 and s are given for
        every slip system)."""
        p = np.asarray(props, dtype=float)
        k = 3 + n_elastic  # rho0, cvav, tol + elastic constants
        nkin = len(p) - k - 2  # gruneisen + e_ref trail
        if nkin == 13 + 3 * nslip and nslip > 1:
            S = nslip
            i = k
            mu, tk = p[i], p[i + 1]
            i += 2
            c1 = p[i:i + S].copy()
            i += S
            tau_a, pp, qq, gw, gr, wrd = p[i:i + 6]
            i += 6
            go = p[i:i + S].copy()
            i += S
            s = p[i:i + S].copy()
            i += S
            k1, k2_0, ninv, gro_dd, rho_init = p[i:i + 5]
            return cls(mu_ref=float(mu), tk_ref=float(tk), c1=c1,
                       tau_a=float(tau_a), p=float(pp), q=float(qq),
                       gam_wo=float(gw), gam_ro=float(gr), wr_d=float(wrd),
                       go=go, s=s, k1=float(k1), k2_0=float(k2_0),
                       ninv=float(ninv), gam_ro_dd=float(gro_dd),
                       rho_dd_init=float(rho_init), g_athermal=g_athermal)
        vals = p[k:k + 16]
        return cls(*[float(v) for v in vals], g_athermal=g_athermal)

    def init_hardness(self):
        return np.array([self.rho_dd_init])

    def _strength(self, h):
        """Slip-system strength from relative dislocation density.

        Scalar go/s -> shape (..., 1) (broadcast over slip systems);
        per-slip go/s (S,) -> shape (..., S)."""
        rho = jnp.maximum(h[..., 0:1], _TINY)
        return jnp.asarray(self.go) + jnp.asarray(self.s) * jnp.sqrt(rho)

    def strength_floor(self, h):
        """Scalar (per-point) lower bound of the slip strengths — used
        by the implicit solver's initial-guess heuristics."""
        return jnp.min(self._strength(h), axis=-1)

    def operating_ratio(self, deff):
        """|tau|/strength at flow rate deff (thermal branch, p=q~1
        estimate), used only for the implicit solver's initial guess.

        jnp throughout: the calibration fitters trace c1/s/go through
        this (theta carries flow-strength scale factors), so host-side
        float()/np reductions would raise ConcretizationTypeError."""
        c_t = jnp.mean(jnp.asarray(self.c1)) * self.mu_ref / 300.0
        x = jnp.clip(
            1.0 + jnp.log(jnp.maximum(deff, 1e-12) / self.gam_wo) / c_t,
            0.05, 1.0)
        if self.g_athermal:
            # flow at |tau| ~ g + x*tau_a; ratio relative to g(h_init)
            g0 = jnp.min(jnp.asarray(self.go) + jnp.asarray(self.s)
                         * jnp.sqrt(jnp.maximum(
                             jnp.asarray(self.rho_dd_init), 1e-30)))
            return 1.0 + x * self.tau_a / g0
        return x

    def gdots(self, taus, h, temp_k):
        g = self._strength(h)
        if self.g_athermal:  # BCC: strength athermal, Peierls thermal
            tau_eff = jnp.maximum(jnp.abs(taus) - g, 0.0)
            x = jnp.clip(tau_eff / self.tau_a, 0.0, 1.0)
        else:  # FCC/HCP: Peierls athermal, strength thermal
            tau_eff = jnp.maximum(jnp.abs(taus) - self.tau_a, 0.0)
            x = jnp.clip(tau_eff / g, 0.0, 1.0)
        # thermally-activated branch: gam_wo * exp(-(c1 mu / T)(1 - x^p)^q)
        c_t = self.c1 * self.mu_ref / temp_k
        if isinstance(self.p, float) and self.p == 1.0:
            xp = x
        else:  # NaN-safe power at x = 0
            pos = x > 1e-12
            xp = jnp.where(pos, jnp.power(jnp.where(pos, x, 1.0), self.p), 0.0)
        act = jnp.maximum(1.0 - xp, 0.0)
        if isinstance(self.q, float) and self.q == 1.0:
            actq = act
        else:
            pos = act > 1e-12
            actq = jnp.where(pos,
                             jnp.power(jnp.where(pos, act, 1.0), self.q), 0.0)
        # balanced combination gd = gw*gr/(gw+gr), evaluated in log space so
        # the huge dynamic range (gw ~ exp(-300)) stays NaN-free under AD
        tiny = _tiny(taus)
        log_gw = jnp.log(self.gam_wo) - c_t * actq
        log_gr = jnp.log(self.gam_ro / self.wr_d) + \
            jnp.log(jnp.maximum(tau_eff, tiny))
        log_gd = log_gw + log_gr - jnp.logaddexp(log_gw, log_gr)
        floor = -700.0 if taus.dtype == jnp.float64 else -80.0
        gd = jnp.where(tau_eff > 10 * tiny,
                       jnp.exp(jnp.maximum(log_gd, floor)), 0.0)
        return jnp.sign(taus) * gd

    # Floor for the recovery-rate argument: k2 only enters multiplied by
    # dgam = shrate*dt, so its value below shrate ~ 1e-10 is irrelevant —
    # but the *derivative* dk2/dshrate ~ k2/shrate overflows f64 near the
    # denormal floor, which NaNs the coupled consistent tangent in the
    # elastic regime.  1e-10 keeps both the value and the AD path bounded.
    _SHRATE_FLOOR = 1e-10

    def gdots_slope(self, taus, h, temp_k):
        """(gdots, d gdots / d tau) with the slope in closed form.

        Mirrors ``gdots`` exactly; the slope propagates through the
        log-space thermal/drag balance:
        d log(gd) = d log(gw) (1-p_w) + d log(gr) (1-p_r) with
        p_* the softmax weights of logaddexp.
        """
        g = self._strength(h)
        tau_abs = jnp.abs(taus)
        if self.g_athermal:
            tau_eff = jnp.maximum(tau_abs - g, 0.0)
            norm = self.tau_a
        else:
            tau_eff = jnp.maximum(tau_abs - self.tau_a, 0.0)
            norm = g
        xr = tau_eff / norm
        x = jnp.clip(xr, 0.0, 1.0)
        c_t = self.c1 * self.mu_ref / temp_k
        if isinstance(self.p, float) and self.p == 1.0:
            xp, dxp_dx = x, jnp.ones_like(x)
        else:
            pos = x > 1e-12
            xs = jnp.where(pos, x, 1.0)
            xp = jnp.where(pos, jnp.power(xs, self.p), 0.0)
            dxp_dx = jnp.where(pos, self.p * jnp.power(xs, self.p - 1.0),
                               0.0)
        act = jnp.maximum(1.0 - xp, 0.0)
        if isinstance(self.q, float) and self.q == 1.0:
            actq, dactq_dact = act, jnp.ones_like(act)
        else:
            pos = act > 1e-12
            acts = jnp.where(pos, act, 1.0)
            actq = jnp.where(pos, jnp.power(acts, self.q), 0.0)
            dactq_dact = jnp.where(pos,
                                   self.q * jnp.power(acts, self.q - 1.0),
                                   0.0)
        tiny = _tiny(taus)
        log_gw = jnp.log(self.gam_wo) - c_t * actq
        tau_eff_s = jnp.maximum(tau_eff, tiny)
        log_gr = jnp.log(self.gam_ro / self.wr_d) + jnp.log(tau_eff_s)
        lse = jnp.logaddexp(log_gw, log_gr)
        log_gd = log_gw + log_gr - lse
        floor = -700.0 if taus.dtype == jnp.float64 else -80.0
        active = tau_eff > 10 * tiny
        mag = jnp.where(active, jnp.exp(jnp.maximum(log_gd, floor)), 0.0)

        dtau_eff = jnp.where(tau_eff > 0.0, 1.0, 0.0)
        in_window = jnp.logical_and(xr > 0.0, xr < 1.0)
        dx = jnp.where(in_window, dtau_eff / norm, 0.0)
        dlgw = c_t * dactq_dact * dxp_dx * dx  # -c_t * d(actq), act=1-xp
        dlgr = dtau_eff / tau_eff_s
        p_w = jnp.exp(log_gw - lse)
        p_r = jnp.exp(log_gr - lse)
        dlog_gd = dlgw * (1.0 - p_w) + dlgr * (1.0 - p_r)
        slope = jnp.where(active, mag * dlog_gd, 0.0)
        return jnp.sign(taus) * mag, slope

    def _k2(self, shrate):
        return self.k2_0 * jnp.power(
            self.gam_ro_dd / jnp.maximum(shrate, self._SHRATE_FLOOR),
            self.ninv)

    def _prod(self, rho):
        """Density production term k1 * rho^a and its derivative."""
        a = self.prod_exponent
        ra = jnp.power(jnp.maximum(rho, _TINY), a)
        return self.k1 * ra, self.k1 * a * ra / jnp.maximum(rho, _TINY)

    def _recov(self, rho, k2):
        """Density recovery term k2 * rho^b and its derivative."""
        b = self.recov_exponent
        rb = jnp.power(jnp.maximum(rho, _TINY), b)
        return k2 * rb, k2 * b * rb / jnp.maximum(rho, _TINY)

    def h_residual(self, h, h_n, gdots, dt, temp_k):
        """Backward-Euler density residual (for the coupled tangent)."""
        del temp_k
        shrate = jnp.sum(jnp.abs(gdots), axis=-1, keepdims=True)
        dgam = shrate * dt
        k2 = self._k2(shrate)
        rho = jnp.maximum(h, _TINY)
        prod, _ = self._prod(rho)
        recov, _ = self._recov(rho, k2)
        return h - h_n - (prod - recov) * dgam

    def update_h(self, h_n, gdots, dt, temp_k):
        """Implicit Kocks-Mecking density update.

        drho/dGamma = k1 rho^a - k2(Gamma_dot) rho^b,
        k2 = k2_0 (gam_ro_dd / Gamma_dot)^ninv.
        """
        del temp_k
        shrate = jnp.sum(jnp.abs(gdots), axis=-1, keepdims=True)
        dgam = shrate * dt
        k2 = self._k2(shrate)
        rho = jnp.maximum(h_n, _TINY)
        for _ in range(20):
            prod, dprod = self._prod(rho)
            recov, drecov = self._recov(rho, k2)
            r = rho - h_n - (prod - recov) * dgam
            drdrho = 1.0 - (dprod - drecov) * dgam
            rho = jnp.maximum(rho - r / drdrho, _TINY)
        return rho


@dataclasses.dataclass(frozen=True)
class SplineG(KMBalD):
    """KMBalD slip kinetics with a free-form hardening map (identification).

    The hardness state is the slip strength g itself and its evolution
    is dg/dGamma = exp(pwl(g; g_knots, log_f)) with flat extrapolation —
    a superset of every Kocks-Mecking (k1, k2, a, b) family expressed
    through g = go + s*sqrt(rho).  Used by
    scripts/identification/fit_mtsdd_np.py to decide whether the MTSDD
    golden residual lives in the hardening law at all; activated via the
    EXACONSTIT_MTSDD_CAL_NP env hook (models/ecmech.py).
    """

    g_knots: tuple = ()
    log_f: object = None

    def init_hardness(self):
        g0 = self.go + np.min(np.asarray(self.s)) * np.sqrt(
            self.rho_dd_init)
        return np.array([float(g0)])

    def _strength(self, h):
        return h[..., 0:1]

    def _f(self, g):
        """(f, df/dg) of the log-piecewise-linear hardening map."""
        kn = jnp.asarray(self.g_knots, dtype=g.dtype)
        lf = jnp.asarray(self.log_f, dtype=g.dtype)
        i = jnp.clip(jnp.searchsorted(kn, g) - 1, 0, len(self.g_knots) - 2)
        x0, x1 = kn[i], kn[i + 1]
        y0, y1 = lf[i], lf[i + 1]
        t = jnp.clip((g - x0) / (x1 - x0), 0.0, 1.0)
        f = jnp.exp(y0 + t * (y1 - y0))
        slope = jnp.where((g > kn[0]) & (g < kn[-1]),
                          (y1 - y0) / (x1 - x0), 0.0)
        return f, f * slope

    def h_residual(self, h, h_n, gdots, dt, temp_k):
        del temp_k
        shrate = jnp.sum(jnp.abs(gdots), axis=-1, keepdims=True)
        f, _ = self._f(h[..., 0:1])
        return h - h_n - f * shrate * dt

    def update_h(self, h_n, gdots, dt, temp_k):
        del temp_k
        import jax as _jax
        shrate = jnp.sum(jnp.abs(gdots), axis=-1, keepdims=True)
        dgam = shrate * dt

        def newton(_, g):
            f, df = self._f(g)
            r = g - h_n - f * dgam
            return g - r / (1.0 - df * dgam)

        # fori_loop keeps the traced graph small (this runs inside the
        # staggered solve's while_loops; an unrolled scalar Newton there
        # explodes compile time).  The iteration's forward-mode tangents
        # are CUT (stop_gradient): mid-iteration denominator crossings
        # produce inf/NaN tangents even when the value path is fine —
        # the BCC identification's jacfwd stall (bcc_jac_probe.py).
        # Identification processes (EXACONSTIT_IFT_TANGENTS=1, see
        # evptn_cm._ift_tangents) additionally attach a straight-through
        # Newton correction carrying the exact implicit-function-theorem
        # tangent of r(g; h_n, dgam, theta) = 0; the production value
        # path stays bitwise the loop's solution.
        g_star = _jax.lax.stop_gradient(
            _jax.lax.fori_loop(0, 30, newton, h_n))
        from .evptn_cm import _ift_tangents
        if not _ift_tangents():
            return g_star
        f, df = self._f(g_star)
        den = 1.0 - df * dgam
        den = jnp.where(jnp.abs(den) > 1e-3, den,
                        jnp.where(den >= 0.0, 1e-3, -1e-3))
        corr = (g_star - h_n - f * dgam) / den
        return g_star - (corr - _jax.lax.stop_gradient(corr))

    def update_h_explicit(self, h_n, gdots, dt, temp_k):
        del temp_k
        shrate = jnp.sum(jnp.abs(gdots), axis=-1, keepdims=True)
        f, _ = self._f(h_n)
        return h_n + f * shrate * dt
