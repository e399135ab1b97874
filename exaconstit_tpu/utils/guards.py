"""Jit-safe numerics guards (debug mode).

The reference guards with host-side MFEM_ASSERT/MFEM_VERIFY (e.g. the
convergence verify in system_driver.cpp:287 and option validation
throughout option_parser.cpp).  Inside an XLA program assertions must be
functionalized, so the equivalent here is ``jax.experimental.checkify``:
``checked_jit`` compiles a function with NaN checks threaded through it
and re-raises on the host with the failing primitive's location.

Off by default (the instrumented program is slower and the production
kinetics are NaN-safe by construction -- see models/kinetics.py); enable
with ``EXACONSTIT_CHECK_NUMERICS=1`` to localize a numerics fault in one
run instead of bisecting host-side norm prints.
"""

import functools
import os

import jax


def numerics_checks_enabled() -> bool:
    return os.environ.get("EXACONSTIT_CHECK_NUMERICS", "0") not in ("", "0")


def checked_jit(fn, static_argnums=()):
    """``jax.jit`` that optionally threads checkify NaN/user checks.

    With EXACONSTIT_CHECK_NUMERICS unset this is exactly ``jax.jit``
    (zero overhead); set, every op producing a NaN raises a
    ``JaxRuntimeError`` naming the failing primitive.
    """
    if not numerics_checks_enabled():
        return jax.jit(fn, static_argnums=static_argnums)
    from jax.experimental import checkify

    errors = checkify.user_checks | checkify.nan_checks
    cfn = jax.jit(checkify.checkify(fn, errors=errors),
                  static_argnums=static_argnums)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper
