"""Persistent XLA compilation cache setup.

TPU compiles in this environment go through a remote-compile tunnel and cost
20-340 s per program; the persistent cache makes repeat invocations of
bench/verify/CLI near-instant for unchanged programs. Enabled by every CLI
entry point; opt out with ``CADUCEUS_NO_COMPILE_CACHE=1`` or point the cache
elsewhere with ``CADUCEUS_COMPILE_CACHE_DIR``.
"""

from __future__ import annotations

import os


def enable_compile_cache() -> None:
    """Idempotently enable JAX's persistent compilation cache."""
    if os.environ.get("CADUCEUS_NO_COMPILE_CACHE") == "1":
        return
    if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
        # CPU AOT cache entries embed host machine features; sharing them
        # across the remote-compile host and this machine SIGILL-risks.
        # CPU compiles are fast anyway — cache only the tunnel-compiled TPU
        # programs.
        return
    import jax

    cache_dir = os.environ.get(
        "CADUCEUS_COMPILE_CACHE_DIR",
        os.path.expanduser("~/.cache/caduceus_tpu_xla"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything that took measurable compile time
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
