import os
import sys

# The ambient axon sitecustomize force-registers the TPU backend at
# interpreter startup (ignoring JAX_PLATFORMS).  Tests need the 8-device
# virtual CPU mesh, so re-exec once with the axon hook disabled.
if os.environ.get("PALLAS_AXON_POOL_IPS"):
    env = dict(os.environ)
    # preserve the tunnel address for the e2e TPU regression test's
    # subprocess (tests/test_full_regression_tpu.py)
    env.setdefault("EXACONSTIT_TPU_TUNNEL", env["PALLAS_AXON_POOL_IPS"])
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.execvpe(sys.executable, [sys.executable, "-m", "pytest"]
               + sys.argv[1:], env)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

# Persistent XLA compile cache: the regression cases share mesh/program
# shapes, so everything after the first case (and every rerun of the
# suite) hits the cache instead of recompiling.  Local to this machine —
# entries embed host CPU features.
_cache = os.environ.get("EXACONSTIT_TEST_CACHE",
                        os.path.expanduser("~/.cache/exaconstit_jax"))
if _cache != "0":
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
