"""Microbenchmark harness for the selective-scan Pallas kernels.

Times kernel variants in isolation on the real chip (the model-level bench
in bench.py measures the full train step; this isolates the scan so kernel
iterations don't need a full model compile).

Usage:
  python scripts/bench_scan.py [fwd|bidir|bwd|all] [--G 4] [--L 131072] ...

Timing note: through the axon tunnel block_until_ready does not wait for
remote execution — jax.device_get does (round-1 finding, see memory).
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from caduceus_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def chain(kernel_on_u, K):
    """Repeat `u -> kernel(u)` K times inside one jit so per-dispatch tunnel
    overhead (seconds through axon) amortizes away; returns jitted fn.

    Returns only a tiny slice-sum: device_get of the full (G, L, d) output
    would drag ~0.5 GB through the tunnel per timing (seconds of pure
    transfer); the final pallas_call is opaque to XLA so the slice cannot
    dead-code the compute."""

    @jax.jit
    def run(u, *rest):
        def body(_, u):
            return kernel_on_u(u, *rest)

        uf = jax.lax.fori_loop(0, K, body, u)
        return jnp.sum(uf[..., :1, :1].astype(jnp.float32))

    return run


def make_inputs(G, L, d, N, dtype=jnp.bfloat16, seed=0):
    rng = np.random.default_rng(seed)
    u = jnp.asarray(rng.standard_normal((G, L, d)), dtype)
    delta = jnp.asarray(rng.standard_normal((G, L, d)) * 0.5 - 1.0, dtype)
    B = jnp.asarray(rng.standard_normal((G, L, N)), dtype)
    C = jnp.asarray(rng.standard_normal((G, L, N)), dtype)
    A = -jnp.exp(jnp.asarray(rng.standard_normal((d, N)) * 0.5, jnp.float32))
    D = jnp.asarray(rng.standard_normal((d,)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((d,)) * 0.1, jnp.float32)
    return u, delta, B, C, A, D, bias


def report(name, dt, G, L, n_scans=1):
    rowpos = G * L * n_scans
    print(f"{name:40s} {dt*1e3:9.3f} ms   {rowpos/dt/1e6:8.1f} M row-pos/s")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("which", nargs="?", default="all")
    p.add_argument("--G", type=int, default=4)
    p.add_argument("--L", type=int, default=131072)
    p.add_argument("--d", type=int, default=512)
    p.add_argument("--N", type=int, default=16)
    p.add_argument("--chunk", type=int, default=128)
    p.add_argument("--gb", type=int, default=8)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--K", type=int, default=8,
                   help="kernel invocations chained per dispatch")
    args = p.parse_args()
    G, L, d, N = args.G, args.L, args.d, args.N
    u, delta, B, C, A, D, bias = make_inputs(G, L, d, N)
    print(f"shapes: G={G} L={L} d={d} N={N} chunk={args.chunk} gb={args.gb}")

    K = args.K

    if args.which in ("fwd", "all"):
        from caduceus_tpu.ops.scan_pallas import selective_scan_pallas

        fn = chain(
            lambda u, delta, A, B, C, D, bias: selective_scan_pallas(
                u, delta, A, B, C, D, None, True, False,
                args.chunk, args.gb, False, bias),
            K,
        )
        dt = timeit(fn, u, delta, A, B, C, D, bias, iters=args.iters) / K
        report("scan_pallas fwd (inference)", dt, G, L)

        def loss(u, delta, A, B, C, D, bias):
            y = selective_scan_pallas(
                u, delta, A, B, C, D, None, True, False,
                args.chunk, args.gb, False, bias)
            return jnp.sum(y.astype(jnp.float32))

        gfn = jax.grad(loss, argnums=(0,))
        g = chain(lambda u, *rest: gfn(u, *rest)[0].astype(u.dtype), K)
        dt = timeit(g, u, delta, A, B, C, D, bias, iters=args.iters) / K
        report("scan_pallas fwd+bwd", dt, G, L)

    if args.which in ("bidir", "all"):
        from caduceus_tpu.ops.scan_pallas_bidir import bidir_selective_scan_pallas

        fn = chain(
            lambda u, delta, B, C, A, D, bias: bidir_selective_scan_pallas(
                u, delta, B, C, u, delta, B, C, A, A, D, D, bias, bias,
                True, args.chunk, args.gb, False)[0],
            K,
        )
        dt = timeit(fn, u, delta, B, C, A, D, bias, iters=args.iters) / K
        report("bidir fwd (inference)", dt, G, L, n_scans=2)

        def loss2(u, delta, B, C, A, D, bias):
            yf, yr = bidir_selective_scan_pallas(
                u, delta, B, C, u, delta, B, C, A, A, D, D, bias, bias,
                True, args.chunk, args.gb, False)
            return jnp.sum(yf.astype(jnp.float32)) + jnp.sum(yr.astype(jnp.float32))

        g2fn = jax.grad(loss2, argnums=(0,))
        g2 = chain(lambda u, *rest: g2fn(u, *rest)[0].astype(u.dtype), K)
        dt = timeit(g2, u, delta, B, C, A, D, bias, iters=args.iters) / K
        report("bidir fwd+bwd", dt, G, L, n_scans=2)


if __name__ == "__main__":
    main()
