"""BCC companion to mtsdd_extract_law.py: back out the implied density
evolution from the mtsdd_bcc golden (same props_cp_mts.txt; withGAthermal
reading: dislocation strength athermal, Peierls thermally activated)."""
import numpy as np

G = np.loadtxt("/root/reference/test/data/mtsdd_bcc_stress.txt")
dts = np.loadtxt("/root/reference/test/data/custom_dt.txt")[:len(G)]
t = np.cumsum(dts)
rate = 1e-3
eps = t * rate
szz = G[:, 2]

mu, tK = 47.26, 298.0
c1, tau_a, p, q = 1.944106926e3, 4.0e-4, 1.0, 1.0
gam_wo, go, s = 1.0, 8.0e-3, 1.0e-1
k1, k2_0, ninv, gam_o, rho0 = 3.0e-4, 5.0e-5, 0.1, 1.0e-2, 9.0e-4

E_eff = szz[0] / eps[0]
print(f"E={E_eff:.2f} GPa, steps={len(G)}, eps_tot={eps[-1]:.4%}, "
      f"szz: {szz[1]:.4f} -> {szz[-1]:.4f}")

M = 3.06
eps_pl = eps - szz / E_eff
Gam = M * eps_pl
tau = szz / M

gdot_eff = M * rate
c_t = c1 * mu / tK
x = 1.0 + np.log(gdot_eff / gam_wo) / c_t
# BCC: |tau| = g + x * tau_a  (g athermal)
g = tau - x * tau_a
sq = np.clip((g - go) / s, 1e-6, None)
rho = sq ** 2

m = (eps_pl > 2e-4) & (np.arange(len(G)) > 2)
Gm, rm = Gam[m], rho[m]
drho = np.gradient(rm, Gm)
print("\n  Gamma      rho       drho/dGamma")
for i in range(0, len(Gm), 4):
    print(f"  {Gm[i]:.4f}   {rm[i]:.5f}   {drho[i]:10.4f}")

from scipy.optimize import least_squares
for (a, b, lbl) in [(0.5, 1.0, "sqrt-lin"), (0.0, 1.0, "voce-in-rho")]:
    def res(c):
        return np.log(np.clip(c[0] * rm**a - c[1] * rm**b, 1e-12, None)) \
            - np.log(np.clip(drho, 1e-12, None))
    sol = least_squares(res, [max(drho[0], 1.0) / rm[0]**a, 1.0],
                        method="lm")
    c1f, c2f = sol.x
    print(f"[{lbl}] c1={c1f:.4g} c2={c2f:.4g} "
          f"rho_sat={(c1f/c2f)**(1/(b-a)):.4g} "
          f"cost={np.sqrt(2*sol.cost/len(rm)):.3f}")
    print(f"   c1/k1={c1f/k1:.4g}  c2/k2_0={c2f/k2_0:.4g}")
