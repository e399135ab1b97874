#!/bin/sh
# Test runner: forces the 8-device virtual CPU mesh (the ambient axon
# sitecustomize would otherwise pin the single real TPU chip, and the
# conftest re-exec fallback loses output inside pytest's capture).
exec env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    XLA_FLAGS="--xla_force_host_platform_device_count=8" \
    python -m pytest "$@"
