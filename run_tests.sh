#!/bin/sh
# Test runner: forces the 8-device virtual CPU mesh (the ambient axon
# sitecustomize would otherwise pin the single real TPU chip, and the
# conftest re-exec fallback loses output inside pytest's capture).
# The tunnel address is preserved in EXACONSTIT_TPU_TUNNEL so the
# e2e TPU regression test (tests/test_full_regression_tpu.py) can
# restore it for its CLI subprocess.
if [ -n "$PALLAS_AXON_POOL_IPS" ]; then
    EXACONSTIT_TPU_TUNNEL="$PALLAS_AXON_POOL_IPS"
    export EXACONSTIT_TPU_TUNNEL
fi
exec env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    XLA_FLAGS="--xla_force_host_platform_device_count=8" \
    python -m pytest "$@"
