"""Randomized-geometry fuzz: Pallas kernels vs XLA oracles (interpret mode).

The fixed-geometry kernel tests pin the production shapes; this module
draws seeded random geometries — ragged lengths, non-power-of-two widths,
chunk sizes that don't divide L, unroll-unfriendly T — and asserts
value+gradient parity for both kernel families. Catches the class of bug
that only appears at an edge geometry (pad-step handling, slab tails,
carry indexing), which fixed tests by construction cannot.

Seeded draws (no flaky shapes): the geometry list is deterministic.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from caduceus_tpu.ops.scan_pallas import selective_scan_pallas
from caduceus_tpu.ops.selective_scan import selective_scan
from caduceus_tpu.ops.ssd import ssd_chunked
from caduceus_tpu.ops.ssd_pallas import ssd_pallas


def _geometries(seed, n, kind):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        if kind == "scan":
            G = int(rng.integers(1, 4))
            L = int(rng.integers(17, 200))
            d = int(rng.choice([8, 16, 24, 40, 128]))
            N = int(rng.choice([2, 4, 8, 16]))
            chunk = int(rng.choice([16, 32, 64]))
            out.append((G, L, d, N, chunk))
        else:  # ssd
            G = int(rng.integers(1, 3))
            L = int(rng.integers(33, 300))
            H = int(rng.choice([1, 2, 4]))
            P = int(rng.choice([8, 16, 64]))
            NG = int(rng.choice([1, 2]))
            N = int(rng.choice([16, 32, 128]))
            chunk = int(rng.choice([32, 64, 128]))
            out.append((G, L, H, P, NG, N, chunk))
    return out


@pytest.mark.parametrize("geom", _geometries(0, 6, "scan"),
                         ids=lambda g: "x".join(map(str, g)))
@pytest.mark.parametrize("reverse", [False, True])
def test_scan_fuzz_value_and_grad(geom, reverse):
    G, L, d, N, chunk = geom
    ks = jax.random.split(jax.random.PRNGKey(hash(geom) % (2 ** 31)), 7)
    u = jax.random.normal(ks[0], (G, L, d), jnp.float32)
    delta = jax.random.normal(ks[1], (G, L, d)) * 0.5
    A = -jnp.exp(jax.random.normal(ks[2], (d, N)) * 0.5)
    B = jax.random.normal(ks[3], (G, L, N))
    C = jax.random.normal(ks[4], (G, L, N))
    D = jax.random.normal(ks[5], (d,))
    dt_bias = jax.random.normal(ks[6], (d,)) * 0.1

    def k_loss(args):
        y = selective_scan_pallas(args[0], args[1], args[2], args[3], args[4],
                                  args[5], None, True, reverse, chunk, 2,
                                  True, args[6])
        return jnp.mean(jnp.square(y))

    def o_loss(args):
        y = selective_scan(args[0], args[1], args[2], args[3], args[4],
                           D=args[5], z=None, delta_bias=args[6],
                           delta_softplus=True, reverse=reverse)
        return jnp.mean(jnp.square(y))

    args = (u, delta, A, B, C, D, dt_bias)
    vk, gk = jax.value_and_grad(k_loss)(args)
    vo, go = jax.value_and_grad(o_loss)(args)
    np.testing.assert_allclose(vk, vo, rtol=2e-4)
    for name, a, b in zip("u delta A B C D dt_bias".split(), gk, go):
        scale = float(np.abs(b).max()) + 1e-9
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=5e-3,
            err_msg=f"{name} geom={geom} reverse={reverse}")


@pytest.mark.parametrize("geom", _geometries(1, 4, "ssd"),
                         ids=lambda g: "x".join(map(str, g)))
def test_ssd_fuzz_value_and_grad(geom):
    G, L, H, P, NG, N, chunk = geom
    ks = jax.random.split(jax.random.PRNGKey(hash(geom) % (2 ** 31)), 7)
    x = jax.random.normal(ks[0], (G, L, H, P), jnp.float32)
    dt = jax.random.normal(ks[1], (G, L, H)) * 0.5
    A = -jnp.exp(jax.random.normal(ks[2], (H,)) * 0.5)
    B = jax.random.normal(ks[3], (G, L, NG, N))
    C = jax.random.normal(ks[4], (G, L, NG, N))
    D = jax.random.normal(ks[5], (H,))
    dt_bias = jax.random.normal(ks[6], (H,)) * 0.1

    def loss(fn):
        def f(args):
            y = fn(*args[:5], D=args[5], dt_bias=args[6], dt_softplus=True,
                   chunk_size=chunk, seg_chunks=2, interpret=True)
            return jnp.mean(jnp.square(y))
        return f

    def loss_oracle(args):
        y = ssd_chunked(*args[:5], D=args[5], dt_bias=args[6],
                        dt_softplus=True, chunk_size=chunk, seg_chunks=2)
        return jnp.mean(jnp.square(y))

    args = (x, dt, A, B, C, D, dt_bias)
    vk, gk = jax.value_and_grad(loss(ssd_pallas))(args)
    vo, go = jax.value_and_grad(loss_oracle)(args)
    np.testing.assert_allclose(vk, vo, rtol=2e-4)
    for name, a, b in zip("x dt A B C D dt_bias".split(), gk, go):
        scale = float(np.abs(b).max()) + 1e-9
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=5e-3,
            err_msg=f"{name} geom={geom}")
