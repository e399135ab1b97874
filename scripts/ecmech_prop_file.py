#!/usr/bin/env python3
"""Generate material property files for the crystal-plasticity models.

Documents + produces the parameter ordering the framework (and the
reference's ExaCMech models) expect:

PowerVoce FCC/BCC (17 params; +1 Voce exponent after gs0 for the NL
variant):
  rho0, cv, solver_tol,
  c11, c12, c44,
  shear_modulus, m (rate sensitivity), gdot_0,
  h0, g0 (initial CRSS), gs0 (saturation CRSS),
  xms (saturation rate exponent), gam_s (saturation rate coeff),
  hdn_init (unused),
  gruneisen, ref_internal_energy

MTSDD (Kocks-Mecking dislocation density, 24 cubic / 26 hex):
  rho0, cv, solver_tol,
  elastic constants (c11,c12,c44 | c11,c12,c13,c33,c44),
  mu_ref, T_ref, g0*b^3/kB, tau_Peierls, p, q,
  gam_wo, gam_ro, drag stress, go, s,
  k1, k2_0, ninv, gam_ro_dd, rho_dd_init,
  gruneisen, ref_internal_energy
"""

import argparse

import numpy as np


def voigt_reuss_shear(c11, c12, c44):
    mu = (c11 - c12) / 2.0
    nu = c44
    voigt = 0.2 * (2.0 * mu + 3.0 * nu)
    reuss = (mu * nu) / (nu + 3.0 * (mu - nu) * 0.2)
    return 0.5 * (voigt + reuss)


def voce_params(c11=168.4, c12=121.4, c44=75.2, rho0=8.920e-6,
                heat_cap=0.003435984, tol=1e-10, shear_mod=44.0, m=0.02,
                gdot0=1.0, h0=0.4, g0=17e-3, gs0=122.4e-3, xms=0.0,
                gam_s=5e9, hdn_init=17e-3, gruneisen=0.0, ref_temp=300.0,
                nl_exponent=None):
    p = [rho0, heat_cap, tol, c11, c12, c44, shear_mod, m, gdot0, h0, g0,
         gs0]
    if nl_exponent is not None:
        p.append(nl_exponent)
    p += [xms, gam_s, hdn_init, gruneisen, -heat_cap * ref_temp]
    return np.array(p)


def mts_params(c11=168.4, c12=121.4, c44=75.2, rho0=8.920e-6,
               heat_cap=385.2, tol=1e-8, ref_temp=300.0,
               g0b3_kb=1944.106926, peierls=4e-4, p=1.0, q=1.0, gam_wo=1.0,
               gam_ro=1.0, drag_stress=0.03, go=0.008, s=0.1, k1=3e-4,
               k2_0=5e-5, ninv=0.1, gam_ro_dd=0.01, rho_dd_init=9e-4,
               gruneisen=0.0):
    mu_ref = voigt_reuss_shear(c11, c12, c44)
    return np.array([
        rho0, heat_cap, tol, c11, c12, c44, mu_ref, ref_temp, g0b3_kb,
        peierls, p, q, gam_wo, gam_ro, drag_stress, go, s, k1, k2_0, ninv,
        gam_ro_dd, rho_dd_init, gruneisen, -heat_cap * ref_temp])


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", choices=["voce", "vocenl", "mts"],
                    default="voce")
    ap.add_argument("-o", "--output", default="props.txt")
    args = ap.parse_args()
    if args.model == "voce":
        p = voce_params()
    elif args.model == "vocenl":
        p = voce_params(nl_exponent=1.0)
    else:
        p = mts_params()
    np.savetxt(args.output, p)
    print(f"wrote {len(p)} parameters to {args.output}")


if __name__ == "__main__":
    main()
