"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on CPU via
``--xla_force_host_platform_device_count`` (no TPU pod needed); the real-TPU
path is exercised by `bench.py` and the driver's compile checks.

Environment gotcha: this container's sitecustomize registers the axon TPU
plugin at interpreter start and force-sets ``jax_platforms="axon,cpu"``,
which would silently run "CPU" tests on the tunneled TPU chip (slow,
single-device, bf16 matmul precision). We override the config back to cpu
here. For fast startup, ALSO launch pytest with the axon boot skipped:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest tests/ -q

(see scripts/test.sh).
"""

import os

# XLA:CPU's compiler recurses deeply on large scan bodies (the SSD chunked
# dual form); raise the stack soft limit to the hard limit as headroom.
# NOTE: this alone is NOT sufficient — a full-suite single process still
# segfaults in backend_compile ~210 tests in (observed with unlimited
# stack; compiler-state accumulation, not reproducible in a fresh
# process), so scripts/test.sh runs the suite as two pytest processes.
try:
    import resource

    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    if _soft != _hard:
        resource.setrlimit(resource.RLIMIT_STACK, (_hard, _hard))
except Exception:  # pragma: no cover — best-effort on exotic kernels
    pass

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# sitecustomize's axon register() may have already overridden jax_platforms;
# force it back before any backend initializes.
jax.config.update("jax_platforms", "cpu")
