#!/bin/sh
# Run the test suite on a virtual 8-device CPU mesh.
# The axon sitecustomize pins the TPU backend at interpreter boot, so the env
# must be scrubbed BEFORE python starts (tests/conftest.py alone is too late).
cd "$(dirname "$0")/.." || exit 1
exec env -u PALLAS_AXON_POOL_IPS \
    JAX_PLATFORMS=cpu \
    XLA_FLAGS="--xla_force_host_platform_device_count=8" \
    python -m pytest tests/ "$@"
