#!/usr/bin/env bash
# Run the test suite on CPU with the axon TPU-tunnel boot skipped
# (2s interpreter start instead of ~2min; see tests/conftest.py).
#
# The suite runs as TWO sequential pytest processes. XLA:CPU segfaults
# inside backend_compile roughly once per ~230-test process (always in a
# v2-model scan compile, always ~210 tests in, and NOT reproducible for
# the same test in a fresh process — compiler-state accumulation, observed
# with both 512MB and unlimited RLIMIT_STACK). Two fresh processes keep
# each half below the threshold. Passing any argument (a test path, -x,
# -k ...) falls back to a single invocation with those args.
set -e
cd "$(dirname "$0")/.."
# Stack headroom for XLA:CPU's compile recursion on large scan bodies
# (belt and suspenders with tests/conftest.py's RLIMIT_STACK raise).
ulimit -s unlimited 2>/dev/null || ulimit -s 524288 2>/dev/null || true
export PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu

if [ "$#" -gt 0 ]; then
  exec python -m pytest tests/ -q "$@"
fi

shard_a=$(ls tests/test_[a-r]*.py)
shard_b=$(ls tests/test_[s-z]*.py)
python -m pytest $shard_a -q
python -m pytest $shard_b -q
