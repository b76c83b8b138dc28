"""Paired bidirectional kernel vs two single-direction kernel calls."""

import numpy as np
import jax
import jax.numpy as jnp

from caduceus_tpu.ops.scan_pallas import selective_scan_pallas
from caduceus_tpu.ops.scan_pallas_bidir import bidir_selective_scan_pallas


def _inputs(key, G=4, L=96, d=32, N=4):
    ks = jax.random.split(key, 14)
    mk = lambda i, shape, s=1.0: jax.random.normal(ks[i], shape) * s
    uf, df = mk(0, (G, L, d)), mk(1, (G, L, d), 0.5)
    Bf, Cf = mk(2, (G, L, N)), mk(3, (G, L, N))
    ur, dr = mk(4, (G, L, d)), mk(5, (G, L, d), 0.5)
    Br, Cr = mk(6, (G, L, N)), mk(7, (G, L, N))
    Af = -jnp.exp(mk(8, (d, N), 0.5))
    Ar = -jnp.exp(mk(9, (d, N), 0.5))
    Df, Dr = mk(10, (d,)), mk(11, (d,))
    bf, br = mk(12, (d,)) * 0.1, mk(13, (d,)) * 0.1
    return uf, df, Bf, Cf, ur, dr, Br, Cr, Af, Ar, Df, Dr, bf, br


def _single(u, delta, A, B, C, D, bias, reverse):
    return selective_scan_pallas(u, delta, A, B, C, D, None,
                                 True, reverse, 32, 2, True, bias)


def test_bidir_matches_two_singles():
    a = _inputs(jax.random.PRNGKey(0))
    uf, df, Bf, Cf, ur, dr, Br, Cr, Af, Ar, Df, Dr, bf, br = a
    yf, yr = bidir_selective_scan_pallas(*a, True, 32, 2, True)
    wf = _single(uf, df, Af, Bf, Cf, Df, bf, False)
    wr = _single(ur, dr, Ar, Br, Cr, Dr, br, True)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(wf), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(yr), np.asarray(wr), rtol=1e-5, atol=1e-5)


def test_bidir_ragged_length():
    a = _inputs(jax.random.PRNGKey(1), L=50)
    uf, df, Bf, Cf, ur, dr, Br, Cr, Af, Ar, Df, Dr, bf, br = a
    yf, yr = bidir_selective_scan_pallas(*a, True, 32, 2, True)
    wf = _single(uf, df, Af, Bf, Cf, Df, bf, False)
    wr = _single(ur, dr, Ar, Br, Cr, Dr, br, True)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(wf), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(yr), np.asarray(wr), rtol=1e-5, atol=1e-5)


def test_bidir_grads_match():
    a = _inputs(jax.random.PRNGKey(2), G=2, L=48, d=16)

    def loss_pair(a):
        yf, yr = bidir_selective_scan_pallas(*a, True, 16, 2, True)
        return jnp.sum(jnp.square(yf)) + jnp.sum(jnp.square(yr * 1.3))

    def loss_single(a):
        uf, df, Bf, Cf, ur, dr, Br, Cr, Af, Ar, Df, Dr, bf, br = a
        yf = _single(uf, df, Af, Bf, Cf, Df, bf, False)
        yr = _single(ur, dr, Ar, Br, Cr, Dr, br, True)
        return jnp.sum(jnp.square(yf)) + jnp.sum(jnp.square(yr * 1.3))

    g1 = jax.grad(loss_pair)(a)
    g2 = jax.grad(loss_single)(a)
    for x, y in zip(g1, g2):
        scale = float(np.abs(np.asarray(y)).max()) + 1e-9
        np.testing.assert_allclose(np.asarray(x) / scale, np.asarray(y) / scale,
                                   atol=5e-3)
