"""Causal depthwise conv vs numpy; reverse-direction flip-conjugacy."""

import numpy as np
import jax
import jax.numpy as jnp

from caduceus_tpu.ops import causal_conv1d


def numpy_causal_conv(x, w, b=None):
    Bsz, L, d = x.shape
    K = w.shape[0]
    xp = np.pad(x, ((0, 0), (K - 1, 0), (0, 0)))
    out = np.zeros_like(x)
    for k in range(K):
        out += xp[:, k : k + L, :] * w[k]
    if b is not None:
        out += b
    return out


def test_matches_numpy():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 11, 6))
    w = jax.random.normal(jax.random.PRNGKey(1), (4, 6))
    b = jax.random.normal(jax.random.PRNGKey(2), (6,))
    got = causal_conv1d(x, w, b, activation=None)
    want = numpy_causal_conv(np.asarray(x), np.asarray(w), np.asarray(b))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_silu_applied():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 5, 3))
    w = jax.random.normal(jax.random.PRNGKey(1), (4, 3))
    got = causal_conv1d(x, w, None, activation="silu")
    lin = causal_conv1d(x, w, None, activation=None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(jax.nn.silu(lin)), rtol=1e-6)


def test_reverse_is_flip_conjugate():
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 9, 4))
    w = jax.random.normal(jax.random.PRNGKey(4), (4, 4))
    b = jax.random.normal(jax.random.PRNGKey(5), (4,))
    got = causal_conv1d(x, w, b, activation="silu", reverse=True)
    flip = lambda t: jnp.flip(t, axis=1)
    want = flip(causal_conv1d(flip(x), w, b, activation="silu"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_batch_rank_agnostic():
    # (2, B, L, d) strand-batched input must work unchanged.
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 3, 9, 4))
    w = jax.random.normal(jax.random.PRNGKey(7), (4, 4))
    got = causal_conv1d(x, w, None, activation=None)
    per = jnp.stack([causal_conv1d(x[i], w, None, activation=None) for i in range(2)])
    np.testing.assert_allclose(np.asarray(got), np.asarray(per), rtol=1e-6)
