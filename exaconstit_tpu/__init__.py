"""ExaConstit-TPU: a TPU-native crystal-plasticity FEM framework.

A ground-up JAX/XLA re-design of the capabilities of LLNL/ExaConstit
(reference: /root/reference): a nonlinear, quasi-static, implicit
velocity-based solid-mechanics solver for polycrystal homogenization,
with ExaCMech-equivalent crystal-plasticity material models evaluated
at every quadrature point.

Design stance (TPU-first, not a port):
  * All quadrature-point state lives in pytrees of ``f64[nelems, nqpts, vdim]``
    arrays sharded on the element axis across a ``jax.sharding.Mesh``.
  * The matrix-free operator action is batched tensor contractions
    (einsum / batched matmul on the MXU), not per-element loops.
  * The per-point implicit crystal-plasticity solve is a vmapped batched
    Newton iteration (`lax.while_loop`) with a consistent tangent from the
    implicit-function theorem.
  * Newton-Krylov outer/inner solves are jit-compiled `lax.while_loop`
    fixed-point iterations with XLA collectives for all reductions.

Numerical parity targets the reference test suite
(`/root/reference/test/data/*.toml` golden average-stress files).
"""

import os

# XLA's AOT cache loader logs a full machine-feature dump (at ERROR level)
# on every persistent-cache hit when the cache entry was built with
# different tuning flags; it is cosmetic (the entry still loads) but floods
# test logs.  Opt out of C++ log spam unless the user asked for it.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

# The reference (MFEM/hypre/ExaCMech) is strictly double precision; the
# regression bar is 1e-10 absolute on volume-averaged stress.  TPU f64 is
# emulated but correct; a documented mixed-precision mode exists for
# throughput benchmarks (see exaconstit_tpu.config).
import jax

# f64 reproduces the reference's numerics (TPU f64 is emulated but exact
# enough for the 1e-5-relative golden parity).  Setting
# EXACONSTIT_TPU_PRECISION=f32 switches the whole stack to native f32 for
# throughput runs; solver tolerances must be relaxed accordingly
# (material dogleg ~1e-6, Newton rel ~1e-4).
if os.environ.get("EXACONSTIT_TPU_PRECISION", "f64").lower() != "f32":
    jax.config.update("jax_enable_x64", True)

# TPU matmuls on f32 inputs default to bf16 MXU passes, which destroys the
# implicit material solver's convergence; force true-f32 contractions.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the implicit material solve compiles to a
# large XLA program; caching makes repeated runs (tests, driver restarts)
# skip recompilation.
_cache_dir = os.environ.get("EXACONSTIT_TPU_CACHE",
                            os.path.expanduser("~/.cache/exaconstit_tpu_xla"))
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # older jax without these flags
    pass

__version__ = "0.1.0"
