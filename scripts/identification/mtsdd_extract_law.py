"""Back out the implied dislocation-density evolution law from the
mtsdd_full golden stress curve (hypothesis generation for the KMBalD
evolution identification; see models/ecmech.py::_MTSDD_CALIBRATION).

Chain (crude Taylor link, FCC, rate ~1e-3/s):
  sigma_zz(t)  ->  tau = sigma/M,  Gamma = M * eps_pl
  thermal activation at fixed rate: x = 1 + ln(gdot/gam_wo)/c_t
  g = (tau - tau_a) / x;   sqrt(rho) = (g - go)/s
  -> rho(Gamma), fit drho/dGamma vs rho.
"""
import numpy as np

G = np.loadtxt("/root/reference/test/data/mtsdd_full_stress.txt")
dts = np.loadtxt("/root/reference/test/data/custom_dt.txt")
t = np.cumsum(dts)
rate = 1e-3
eps = t * rate
szz = G[:, 2]

# material constants (props_cp_mts.txt)
mu, tK = 47.26, 298.0
c1, tau_a, p, q = 1.944106926e3, 4.0e-4, 1.0, 1.0
gam_wo, go, s = 1.0, 8.0e-3, 1.0e-1
k1, k2_0, ninv, gam_o, rho0 = 3.0e-4, 5.0e-5, 0.1, 1.0e-2, 9.0e-4

E_eff = szz[0] / eps[0]
print(f"apparent elastic modulus E={E_eff:.2f} GPa, total eps={eps[-1]:.4%}")

M = 3.06  # FCC Taylor factor
eps_pl = eps - szz / E_eff
Gam = M * eps_pl
tau = szz / M

# strain-rate partition among slip systems: assume ~total gdot = M*rate
gdot_eff = M * rate
c_t = c1 * mu / tK
x = 1.0 + np.log(gdot_eff / gam_wo) / c_t
print(f"c_t={c_t:.1f}  x(thermal ratio)={x:.4f}")

g = (tau - tau_a) / x
sq = np.clip((g - go) / s, 1e-6, None)
rho = sq ** 2

# restrict to developed plastic flow
m = (eps_pl > 2e-4) & (np.arange(len(G)) > 2)
Gm, rm = Gam[m], rho[m]
drho = np.gradient(rm, Gm)
print("\n  Gamma      rho       drho/dGamma   k1*sqrt(rho)[file]")
for i in range(0, len(Gm), 4):
    print(f"  {Gm[i]:.4f}   {rm[i]:.5f}   {drho[i]:10.4f}   "
          f"{k1*np.sqrt(rm[i]):.3e}")

# fit drho/dGamma = c1f*rho^a - c2f*rho^b for (a,b)=(0.5,1) and (0,1)
from scipy.optimize import least_squares
for (a, b, lbl) in [(0.5, 1.0, "sqrt-lin"), (0.0, 1.0, "voce-in-rho"),
                    (0.5, 2.0, "sqrt-quad")]:
    def res(c):
        return np.log(np.clip(c[0] * rm**a - c[1] * rm**b, 1e-12, None)) \
            - np.log(np.clip(drho, 1e-12, None))
    sol = least_squares(res, [drho[0] / rm[0]**a, 1.0], method="lm")
    c1f, c2f = sol.x
    print(f"[{lbl}] c1={c1f:.4g} c2={c2f:.4g}  rho_sat={(c1f/c2f)**(1/(b-a)):.4g}"
          f"  cost={np.sqrt(2*sol.cost/len(rm)):.3f}")
    print(f"   ratios: c1/k1={c1f/k1:.4g}  c2/k2_0={c2f/k2_0:.4g}"
          f"  c1/c2 vs k1/k2: {c1f/c2f:.4g} vs {k1/k2_0:.4g}")
