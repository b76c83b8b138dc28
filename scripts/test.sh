#!/usr/bin/env bash
# Run the test suite on CPU with the axon TPU-tunnel boot skipped
# (2s interpreter start instead of ~2min; see tests/conftest.py).
set -e
cd "$(dirname "$0")/.."
# XLA:CPU compile recursion needs headroom on large scan bodies — see the
# RLIMIT_STACK note in tests/conftest.py (belt and suspenders here)
ulimit -s unlimited 2>/dev/null || ulimit -s 524288 2>/dev/null || true
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu exec python -m pytest tests/ -q "$@"
