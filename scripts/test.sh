#!/usr/bin/env bash
# Run the test suite on CPU with the axon TPU-tunnel boot skipped
# (2s interpreter start instead of ~2min; see tests/conftest.py).
set -e
cd "$(dirname "$0")/.."
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu exec python -m pytest tests/ -q "$@"
