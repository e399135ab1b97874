"""Equation of state for the volumetric response.

Equivalent of ExaCMech's EosModelConst (referenced from
src/mechanics_ecmech.hpp:409-414): constant bulk modulus with a
Grüneisen thermal term.  All reference test cases use gruneisen = 0, so
the thermal coupling is inert there; it is retained for completeness.

Pressure convention matches the wrapper (src/mechanics_ecmech.cpp:94-98,
144-151): p = -mean(sigma); p > 0 in compression.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class EosConst:
    bulk: float
    gruneisen: float = 0.0
    rho0: float = 1.0
    e0: float = 0.0  # reference internal energy (per unit reference volume)

    def pressure(self, v, e_int):
        """Cauchy pressure at relative volume v and internal energy e_int."""
        p_cold = -self.bulk * jnp.log(v) / v
        p_therm = self.gruneisen * self.rho0 / v * (e_int - self.e0)
        return p_cold + p_therm

    def dpressure_dvolstrain(self, v):
        """-d(mean stress)/d(eps_vol) ~ bulk modulus at v~1."""
        return self.bulk * (1.0 - jnp.log(v)) / (v * v)
