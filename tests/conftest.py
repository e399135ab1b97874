import os

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware; numerical checks are in f64.
# Force CPU: the ambient environment pins JAX_PLATFORMS=axon (single real
# TPU chip); tests need the 8-device virtual CPU mesh instead.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
