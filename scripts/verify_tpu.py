"""On-device numerics gate: real Mosaic kernels vs the XLA oracle.

The interpret-mode tests (tests/test_scan_pallas*.py) validate kernel MATH
on CPU; this script validates the actual Mosaic COMPILATION on the attached
TPU — fwd and bwd, single-direction and paired-direction — against the XLA
chunked-scan oracle (`ops/selective_scan.py`), with the scale-aware
tolerances of tests/test_scan_pallas_bwd.py. Mosaic-vs-interpret divergence
(layout bugs, bf16 rounding surprises, dynamic-slice miscompiles) fails
loudly here instead of shipping silently (VERDICT r1 "what's weak" #2).

Run (also reachable via `BENCH_VERIFY=1 python bench.py`):
    python scripts/verify_tpu.py

Exit code 0 = all checks passed. Prints one line per check.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from caduceus_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np


def _inputs(key, G, L, d, N, dtype=jnp.float32):
    ks = jax.random.split(key, 7)
    u = jax.random.normal(ks[0], (G, L, d), dtype)
    delta = (jax.random.normal(ks[1], (G, L, d)) * 0.5).astype(dtype)
    A = -jnp.exp(jax.random.normal(ks[2], (d, N)) * 0.5)
    B = jax.random.normal(ks[3], (G, L, N), dtype)
    C = jax.random.normal(ks[4], (G, L, N), dtype)
    D = jax.random.normal(ks[5], (d,))
    dt_bias = jax.random.normal(ks[6], (d,)) * 0.1
    return u, delta, A, B, C, D, dt_bias


def _check(name, got, want, atol, failures):
    got = np.asarray(jax.device_get(got), np.float32)
    want = np.asarray(jax.device_get(want), np.float32)
    scale = float(np.abs(want).max()) + 1e-9
    err = float(np.abs(got - want).max()) / scale
    ok = err <= atol
    print(f"{'PASS' if ok else 'FAIL'}  {name:45s} rel-err {err:.2e} "
          f"(tol {atol:.0e})")
    if not ok:
        failures.append(name)


def main():
    from caduceus_tpu.ops.scan_pallas import selective_scan_pallas
    from caduceus_tpu.ops.scan_pallas_bidir import bidir_selective_scan_pallas
    from caduceus_tpu.ops.selective_scan import selective_scan

    backend = jax.default_backend()
    print(f"backend: {backend}, device: {jax.devices()[0].device_kind}")
    if backend == "cpu":
        print("WARNING: running the 'real Mosaic' gate on CPU exercises "
              "interpret mode only")

    # realistic d/N so production tile paths compile; modest L for speed
    G, L, d, N = 4, 2048, 512, 16
    u, delta, A, B, C, D, dt_bias = _inputs(jax.random.PRNGKey(0), G, L, d, N)
    failures = []

    # ---- forward, both directions ----
    for reverse in (False, True):
        y_k = jax.jit(
            lambda u, delta, A, B, C, D, dt_bias, r=reverse:
            selective_scan_pallas(u, delta, A, B, C, D, None, True, r,
                                  128, 8, False, dt_bias)
        )(u, delta, A, B, C, D, dt_bias)
        y_o = jax.jit(
            lambda u, delta, A, B, C, D, dt_bias, r=reverse:
            selective_scan(u, delta, A, B, C, D=D, delta_bias=dt_bias,
                           delta_softplus=True, reverse=r)
        )(u, delta, A, B, C, D, dt_bias)
        _check(f"fwd kernel reverse={reverse}", y_k, y_o, 2e-3, failures)

    # ---- paired-direction forward ----
    yf, yr = jax.jit(
        lambda u, delta, B, C, A, D, bias: bidir_selective_scan_pallas(
            u, delta, B, C, u, delta, B, C, A, A, D, D, bias, bias,
            True, 128, 8, False)
    )(u, delta, B, C, A, D, dt_bias)
    y_of = selective_scan(u, delta, A, B, C, D=D, delta_bias=dt_bias,
                          delta_softplus=True, reverse=False)
    y_or = selective_scan(u, delta, A, B, C, D=D, delta_bias=dt_bias,
                          delta_softplus=True, reverse=True)
    _check("bidir kernel fwd-direction", yf, y_of, 2e-3, failures)
    _check("bidir kernel rev-direction", yr, y_or, 2e-3, failures)

    # ---- backward: kernel VJP vs autodiff through the XLA oracle ----
    args = (u, delta, A, B, C, D, dt_bias)
    names = ["u", "delta", "A", "B", "C", "D", "dt_bias"]

    def loss_k(args):
        u, delta, A, B, C, D, dt_bias = args
        y = selective_scan_pallas(u, delta, A, B, C, D, None,
                                  True, False, 128, 8, False, dt_bias)
        return jnp.sum(jnp.square(y.astype(jnp.float32))) / y.size

    def loss_o(args):
        u, delta, A, B, C, D, dt_bias = args
        y = selective_scan(u, delta, A, B, C, D=D, delta_bias=dt_bias,
                           delta_softplus=True)
        return jnp.sum(jnp.square(y.astype(jnp.float32))) / y.size

    g_k = jax.jit(jax.grad(loss_k))(args)
    g_o = jax.jit(jax.grad(loss_o))(args)
    for n, a, b in zip(names, g_k, g_o):
        # bf16 h/dA scratch in the bwd kernel → ~0.2% relative noise
        _check(f"bwd grad {n}", a, b, 5e-3, failures)

    # ---- paired backward (opt-in path, CADUCEUS_BIDIR_BWD=1) ----
    os.environ["CADUCEUS_BIDIR_BWD"] = "1"

    def loss_bidir(args):
        u, delta, A, B, C, D, dt_bias = args
        yf, yr = bidir_selective_scan_pallas(
            u, delta, B, C, u, delta, B, C, A, A, D, D, dt_bias, dt_bias,
            True, 128, 8, False)
        y = yf + yr
        return jnp.sum(jnp.square(y.astype(jnp.float32))) / y.size

    def loss_bidir_o(args):
        u, delta, A, B, C, D, dt_bias = args
        yf = selective_scan(u, delta, A, B, C, D=D, delta_bias=dt_bias,
                            delta_softplus=True, reverse=False)
        yr = selective_scan(u, delta, A, B, C, D=D, delta_bias=dt_bias,
                            delta_softplus=True, reverse=True)
        y = yf + yr
        return jnp.sum(jnp.square(y.astype(jnp.float32))) / y.size

    g_bk = jax.jit(jax.grad(loss_bidir))(args)
    g_bo = jax.jit(jax.grad(loss_bidir_o))(args)
    for n, a, b in zip(names, g_bk, g_bo):
        _check(f"paired-bwd grad {n}", a, b, 5e-3, failures)
    del os.environ["CADUCEUS_BIDIR_BWD"]

    if failures:
        print(f"\n{len(failures)} FAILURE(S): {failures}")
        return 1
    print("\nall on-device kernel checks passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
