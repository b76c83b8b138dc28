"""Microbenchmark harness for the SSD (Mamba-2) Pallas kernels.

Times `ops/ssd_pallas.py` in isolation at the production geometry (the
131k headline config's per-direction call: G=4 rows = micro_batch 2 x 2
strands, H=8 heads, P=64, ngroups=1, N=128), so kernel iterations don't
need a full model compile. Companion to scripts/bench_scan.py (v1).

Usage:
  python scripts/bench_ssd.py [fwd|bwd|all] [--chunk 512] [--seg 4] ...

Timing note: through the axon tunnel block_until_ready does not wait for
remote execution — jax.device_get does (see bench_scan.py).
"""

import argparse
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


def chain(kernel_on_x, K):
    """Repeat `x -> kernel(x, ...)` K times inside one jit so per-dispatch
    tunnel overhead (seconds through axon) amortizes away. Returns only a
    tiny slice-sum: device_get of the full (G, L, H·P) output would drag
    ~0.5 GB through the tunnel per timing (~2 s/call of pure transfer at
    microbench iteration counts); the final pallas_call is opaque to XLA so
    the slice cannot dead-code the compute."""

    @jax.jit
    def run(x, *rest):
        def body(_, x):
            return kernel_on_x(x, *rest)

        xf = jax.lax.fori_loop(0, K, body, x)
        return jnp.sum(xf[..., :1, :1].astype(jnp.float32))

    return run


def make_inputs(G, L, H, P, NG, N, dtype=jnp.bfloat16, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((G, L, H, P)), dtype)
    dt = jnp.asarray(rng.standard_normal((G, L, H)) * 0.5 - 1.0, dtype)
    A = -jnp.exp(jnp.asarray(rng.standard_normal((H,)) * 0.5, jnp.float32))
    B = jnp.asarray(rng.standard_normal((G, L, NG, N)), dtype)
    C = jnp.asarray(rng.standard_normal((G, L, NG, N)), dtype)
    D = jnp.asarray(rng.standard_normal((H,)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((H,)) * 0.1, jnp.float32)
    return x, dt, A, B, C, D, bias


def report(name, dt, G, L):
    pos = G * L
    print(f"{name:44s} {dt*1e3:9.3f} ms   {pos/dt/1e6:8.1f} M pos/s")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("which", nargs="?", default="all")
    p.add_argument("--G", type=int, default=4)
    p.add_argument("--L", type=int, default=131072)
    p.add_argument("--H", type=int, default=8)
    p.add_argument("--P", type=int, default=64)
    p.add_argument("--NG", type=int, default=1)
    p.add_argument("--N", type=int, default=128)
    p.add_argument("--chunk", type=int, default=512)
    p.add_argument("--seg", type=int, default=4)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--K", type=int, default=8)
    p.add_argument("--impl", default="pallas",
                   help="pallas | batched | fused "
                        "(ops/ssd_pallas_batched.py; fused = in-kernel "
                        "conv+SiLU+split over raw xBC)")
    args = p.parse_args()
    G, L, H, P, NG, N = args.G, args.L, args.H, args.P, args.NG, args.N
    x, dt, A, B, C, D, bias = make_inputs(G, L, H, P, NG, N)
    print(f"shapes: G={G} L={L} H={H} P={P} NG={NG} N={N} "
          f"chunk={args.chunk} seg={args.seg} impl={args.impl}")

    K = args.K

    if args.impl == "fused":
        from caduceus_tpu.ops.ssd_pallas_batched import (
            ssd_pallas_batched_fused)

        Wc = H * P + 2 * NG * N
        rng = np.random.default_rng(1)
        xBC = jnp.asarray(rng.standard_normal((G, L, Wc)), x.dtype)
        cw = jnp.asarray(rng.standard_normal((4, Wc)) * 0.5, jnp.float32)
        cb = jnp.asarray(rng.standard_normal(Wc) * 0.1, jnp.float32)

        def call(xBC, dt, A, cw, cb, D, bias):
            return ssd_pallas_batched_fused(
                xBC, dt, A, cw, conv_b=cb, D=D, dt_bias=bias,
                dims=(H, P, NG, N), dt_softplus=True,
                chunk_size=args.chunk, seg_chunks=args.seg)

        inputs = (xBC, dt, A, cw, cb, D, bias)
    else:
        if args.impl == "batched":
            from caduceus_tpu.ops.ssd_pallas_batched import (
                ssd_pallas_batched as ssd)
        else:
            from caduceus_tpu.ops.ssd_pallas import ssd_pallas as ssd

        def call(x, dt, A, B, C, D, bias):
            return ssd(x, dt, A, B, C, D=D, dt_bias=bias, dt_softplus=True,
                       chunk_size=args.chunk, seg_chunks=args.seg)

        inputs = (x, dt, A, B, C, D, bias)

    if args.which in ("fwd", "all"):
        if args.impl == "fused":
            # the fused output is (G, L, H, P) while the chained input is
            # (G, L, Wc): reproject so the K-loop stays shape-stable
            def step(xBC, dt, A, cw, cb, D, bias):
                y = call(xBC, dt, A, cw, cb, D, bias)
                return jnp.pad(
                    y.reshape(y.shape[0], y.shape[1], -1),
                    ((0, 0), (0, 0), (0, xBC.shape[-1] - H * P)))

            fn = chain(step, K)
        else:
            fn = chain(call, K)
        t = timeit(fn, *inputs, iters=args.iters) / K
        report(f"ssd fwd (chunk {args.chunk} seg {args.seg})", t, G, L)

    if args.which in ("bwd", "all"):
        def loss(*a):
            y = call(*a)
            return jnp.sum(y.astype(jnp.float32))

        gfn = jax.grad(loss, argnums=(0,))
        if args.impl == "fused":
            g = chain(lambda xBC, *rest: gfn(xBC, *rest)[0].astype(
                xBC.dtype), K)
        else:
            g = chain(lambda x, *rest: gfn(x, *rest)[0].astype(x.dtype), K)
        t = timeit(g, *inputs, iters=args.iters) / K
        report(f"ssd fwd+bwd (chunk {args.chunk} seg {args.seg})", t, G, L)


if __name__ == "__main__":
    main()
