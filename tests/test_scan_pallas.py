"""Pallas selective-scan kernel vs the XLA oracle (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from caduceus_tpu.ops.scan_pallas import selective_scan_pallas
from caduceus_tpu.ops.selective_scan import selective_scan


def _inputs(key, G=4, L=96, d=128, N=8):
    ks = jax.random.split(key, 7)
    u = jax.random.normal(ks[0], (G, L, d), jnp.float32)
    delta = jax.random.normal(ks[1], (G, L, d)) * 0.5
    A = -jnp.exp(jax.random.normal(ks[2], (d, N)) * 0.5)
    B = jax.random.normal(ks[3], (G, L, N))
    C = jax.random.normal(ks[4], (G, L, N))
    D = jax.random.normal(ks[5], (d,))
    dt_bias = jax.random.normal(ks[6], (d,)) * 0.1
    return u, delta, A, B, C, D, dt_bias


def _pallas(u, delta, A, B, C, D, z, reverse, dt_bias, chunk=32, gb=2):
    return selective_scan_pallas(
        u, delta, A, B, C, D, z, True, reverse, chunk, gb, True, dt_bias
    )


@pytest.mark.parametrize("reverse", [False, True])
def test_kernel_matches_xla(reverse):
    u, delta, A, B, C, D, dt_bias = _inputs(jax.random.PRNGKey(0))
    got = _pallas(u, delta, A, B, C, D, None, reverse, dt_bias)
    want = selective_scan(u, delta, A, B, C, D=D, z=None, delta_bias=dt_bias,
                          delta_softplus=True, reverse=reverse)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_kernel_ragged_length():
    # L=50 not a multiple of chunk 32 → padded path
    u, delta, A, B, C, D, dt_bias = _inputs(jax.random.PRNGKey(1), L=50)
    for reverse in (False, True):
        got = _pallas(u, delta, A, B, C, D, None, reverse, dt_bias)
        want = selective_scan(u, delta, A, B, C, D=D, delta_bias=dt_bias,
                              delta_softplus=True, reverse=reverse)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_kernel_with_gate():
    u, delta, A, B, C, D, dt_bias = _inputs(jax.random.PRNGKey(2))
    z = jax.random.normal(jax.random.PRNGKey(3), u.shape)
    got = _pallas(u, delta, A, B, C, D, z, False, dt_bias)
    want = selective_scan(u, delta, A, B, C, D=D, z=z, delta_bias=dt_bias,
                          delta_softplus=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_kernel_bf16_storage():
    u, delta, A, B, C, D, dt_bias = _inputs(jax.random.PRNGKey(4))
    ub, db = u.astype(jnp.bfloat16), delta.astype(jnp.bfloat16)
    Bb, Cb = B.astype(jnp.bfloat16), C.astype(jnp.bfloat16)
    got = _pallas(ub, db, A, Bb, Cb, D, None, False, dt_bias)
    assert got.dtype == jnp.bfloat16
    want = selective_scan(ub, db, A, Bb, Cb, D=D, delta_bias=dt_bias,
                          delta_softplus=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=0.05, atol=0.05
    )


def test_kernel_grad_matches_xla():
    u, delta, A, B, C, D, dt_bias = _inputs(jax.random.PRNGKey(5), G=2, L=32, d=8, N=4)

    def loss_k(args):
        u, delta, A, B, C, D, dt_bias = args
        return jnp.sum(jnp.square(_pallas(u, delta, A, B, C, D, None, False, dt_bias)))

    def loss_x(args):
        u, delta, A, B, C, D, dt_bias = args
        return jnp.sum(jnp.square(selective_scan(
            u, delta, A, B, C, D=D, delta_bias=dt_bias, delta_softplus=True)))

    args = (u, delta, A, B, C, D, dt_bias)
    g1 = jax.grad(loss_k)(args)
    g2 = jax.grad(loss_x)(args)
    for a, b in zip(g1, g2):
        # the kernel backward stores h/dA in bf16 scratch (~0.2% rel noise)
        scale = float(np.abs(np.asarray(b)).max()) + 1e-9
        np.testing.assert_allclose(np.asarray(a) / scale, np.asarray(b) / scale,
                                   atol=5e-3)


def test_chained_scan_matches_split_scan():
    """selective_scan_pallas_chained: (h_init in, h_final out) — scanning a
    sequence in two chained kernel calls equals one full scan, fwd AND bwd
    (the VJP chains g_hN / dL/dh0 across the boundary)."""
    from caduceus_tpu.ops.scan_pallas import selective_scan_pallas_chained
    from caduceus_tpu.ops.selective_scan import selective_scan

    G, L, d, N = 2, 64, 16, 4
    ks = jax.random.split(jax.random.PRNGKey(5), 7)
    u = jax.random.normal(ks[0], (G, L, d))
    delta = jax.random.normal(ks[1], (G, L, d)) * 0.5
    A = -jnp.exp(jax.random.normal(ks[2], (d, N)) * 0.5)
    B = jax.random.normal(ks[3], (G, L, N))
    C = jax.random.normal(ks[4], (G, L, N))
    D = jax.random.normal(ks[5], (d,))
    bias = jax.random.normal(ks[6], (d,)) * 0.1
    h0 = jnp.zeros((G, N, d), jnp.float32)

    def loss_chained(args):
        u, delta, A, B, C, D, bias = args
        h = L // 2
        y1, hm = selective_scan_pallas_chained(
            u[:, :h], delta[:, :h], A, B[:, :h], C[:, :h], D, bias, h0,
            True, False, 16, 2, True)
        y2, _ = selective_scan_pallas_chained(
            u[:, h:], delta[:, h:], A, B[:, h:], C[:, h:], D, bias, hm,
            True, False, 16, 2, True)
        y = jnp.concatenate([y1, y2], axis=1)
        return jnp.sum(jnp.square(y)), y

    def loss_ref(args):
        u, delta, A, B, C, D, bias = args
        y = selective_scan(u, delta, A, B, C, D=D, delta_bias=bias,
                           delta_softplus=True)
        return jnp.sum(jnp.square(y)), y

    args = (u, delta, A, B, C, D, bias)
    (_, y_c) = loss_chained(args)
    (_, y_r) = loss_ref(args)
    np.testing.assert_allclose(np.asarray(y_c), np.asarray(y_r),
                               atol=1e-4, rtol=1e-4)
    g_c = jax.grad(lambda a: loss_chained(a)[0])(args)
    g_r = jax.grad(lambda a: loss_ref(a)[0])(args)
    for n, a, b in zip("u delta A B C D bias".split(), g_c, g_r):
        s = float(np.abs(np.asarray(b)).max()) + 1e-9
        np.testing.assert_allclose(np.asarray(a) / s, np.asarray(b) / s,
                                   atol=5e-3, err_msg=f"chained grad {n}")


def test_chained_scan_reverse_with_padding():
    """reverse + non-multiple L: state-transparent padding must not decay
    h_init through pad steps."""
    from caduceus_tpu.ops.scan_pallas import selective_scan_pallas_chained
    from caduceus_tpu.ops.selective_scan import selective_scan

    G, L, d, N = 1, 50, 16, 4
    ks = jax.random.split(jax.random.PRNGKey(6), 7)
    u = jax.random.normal(ks[0], (G, L, d))
    delta = jax.random.normal(ks[1], (G, L, d)) * 0.5
    A = -jnp.exp(jax.random.normal(ks[2], (d, N)) * 0.5)
    B = jax.random.normal(ks[3], (G, L, N))
    C = jax.random.normal(ks[4], (G, L, N))
    bias = jax.random.normal(ks[6], (d,)) * 0.1
    h0 = jax.random.normal(ks[5], (G, N, d))

    y, hN = selective_scan_pallas_chained(
        u, delta, A, B, C, None, bias, h0, True, True, 16, 1, True)
    y_ref, hN_ref = selective_scan(
        u, delta, A, B, C, delta_bias=bias, delta_softplus=True,
        reverse=True, h_init=jnp.swapaxes(h0, 1, 2), return_final_state=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(jnp.swapaxes(hN, 1, 2)),
                               np.asarray(hN_ref), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("reverse", [False, True])
def test_chained_padding_no_softplus_bias(reverse):
    """delta_softplus=False + nonzero delta_bias + ragged L: pad steps must
    still be the state identity (pad delta = -bias, not 0), and g_bias /
    g_h0 must not pick up spurious pad-step contributions when a final-state
    cotangent flows back through the pads."""
    from caduceus_tpu.ops.scan_pallas import selective_scan_pallas_chained
    from caduceus_tpu.ops.selective_scan import selective_scan

    G, L, d, N = 2, 44, 16, 4  # chunk 16 → 4 pad steps
    ks = jax.random.split(jax.random.PRNGKey(7), 7)
    u = jax.random.normal(ks[0], (G, L, d))
    # keep resolved delta positive-ish so the no-softplus scan is stable
    delta = jax.random.uniform(ks[1], (G, L, d), minval=0.05, maxval=0.6)
    A = -jnp.exp(jax.random.normal(ks[2], (d, N)) * 0.5)
    B = jax.random.normal(ks[3], (G, L, N))
    C = jax.random.normal(ks[4], (G, L, N))
    bias = jax.random.normal(ks[6], (d,)) * 0.2
    h0 = jax.random.normal(ks[5], (G, N, d))

    def out_pallas(args):
        u, delta, A, B, C, bias, h0 = args
        y, hN = selective_scan_pallas_chained(
            u, delta, A, B, C, None, bias, h0, False, reverse, 16, 1, True)
        return jnp.sum(jnp.square(y)) + jnp.sum(jnp.square(hN)), (y, hN)

    def out_ref(args):
        u, delta, A, B, C, bias, h0 = args
        y, hN = selective_scan(
            u, delta, A, B, C, delta_bias=bias, delta_softplus=False,
            reverse=reverse, h_init=jnp.swapaxes(h0, 1, 2),
            return_final_state=True)
        return jnp.sum(jnp.square(y)) + jnp.sum(jnp.square(hN)), (y, hN)

    args = (u, delta, A, B, C, bias, h0)
    _, (y, hN) = out_pallas(args)
    _, (y_r, hN_r) = out_ref(args)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_r),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(jnp.swapaxes(hN, 1, 2)),
                               np.asarray(hN_r), atol=1e-4, rtol=1e-4)
    g = jax.grad(lambda a: out_pallas(a)[0])(args)
    g_r = jax.grad(lambda a: out_ref(a)[0])(args)
    for n, a, b in zip("u delta A B C bias h0".split(), g, g_r):
        b = np.asarray(b)
        if n == "h0":
            a = np.asarray(jnp.swapaxes(a, 1, 2)) if a.shape != b.shape else np.asarray(a)
        s = float(np.abs(b).max()) + 1e-9
        # bf16 kernel staging: slightly looser than the softplus-path test
        np.testing.assert_allclose(np.asarray(a) / s, b / s,
                                   atol=1e-2, err_msg=f"grad {n} ({reverse=})")


def test_kernel_unroll1_fallback():
    """chunk sizes that defeat the 8-aligned slab unroll take the U=1
    per-position path (fwd+bwd); value and grads must still match the
    oracle. Regression: the bwd U=1 path used to emit a zero-size concat
    that Mosaic rejects ("vector types must have positive constant
    sizes")."""
    u, delta, A, B, C, D, dt_bias = _inputs(jax.random.PRNGKey(5), L=60)
    for reverse in (False, True):
        def k_loss(args, r=reverse):
            # chunk 20: _pick_unroll(20, 8) == 1
            y = _pallas(*args[:6], None, r, args[6], chunk=20)
            return jnp.mean(jnp.square(y))

        def o_loss(args, r=reverse):
            y = selective_scan(args[0], args[1], args[2], args[3], args[4],
                               D=args[5], z=None, delta_bias=args[6],
                               delta_softplus=True, reverse=r)
            return jnp.mean(jnp.square(y))

        args = (u, delta, A, B, C, D, dt_bias)
        vk, gk = jax.value_and_grad(k_loss)(args)
        vo, go = jax.value_and_grad(o_loss)(args)
        np.testing.assert_allclose(vk, vo, rtol=2e-4)
        for name, a, b in zip("u delta A B C D dt_bias".split(), gk, go):
            scale = float(np.abs(np.asarray(b)).max()) + 1e-9
            np.testing.assert_allclose(np.asarray(a) / scale,
                                       np.asarray(b) / scale, atol=5e-3,
                                       err_msg=f"{name} reverse={reverse}")
