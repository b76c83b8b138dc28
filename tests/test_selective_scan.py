"""Selective-scan numerics: chunked scan vs sequential oracle vs numpy.

Mirrors the role of the reference's CUDA-kernel-vs-reference tests that the
reference repo itself lacks (SURVEY.md §4 implication).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from caduceus_tpu.ops import selective_scan, selective_scan_ref


def numpy_selective_scan(u, delta, A, B, C, D=None, z=None, delta_bias=None,
                         delta_softplus=False):
    """Straight-line numpy recurrence — the ground truth."""
    u = np.asarray(u, np.float64)
    delta = np.asarray(delta, np.float64)
    if delta_bias is not None:
        delta = delta + np.asarray(delta_bias, np.float64)
    if delta_softplus:
        delta = np.log1p(np.exp(delta))
    A = np.asarray(A, np.float64)
    B = np.asarray(B, np.float64)
    C = np.asarray(C, np.float64)
    Bsz, L, d = u.shape
    N = A.shape[1]
    h = np.zeros((Bsz, d, N))
    ys = np.zeros((Bsz, L, d))
    for t in range(L):
        dA = np.exp(delta[:, t, :, None] * A[None])
        dBu = delta[:, t, :, None] * B[:, t, None, :] * u[:, t, :, None]
        h = dA * h + dBu
        ys[:, t] = np.einsum("bdn,bn->bd", h, C[:, t])
    if D is not None:
        ys = ys + u * np.asarray(D, np.float64)
    if z is not None:
        zf = np.asarray(z, np.float64)
        ys = ys * (zf / (1 + np.exp(-zf)))
    return ys


def _random_inputs(key, Bsz=2, L=37, d=8, N=4):
    ks = jax.random.split(key, 7)
    u = jax.random.normal(ks[0], (Bsz, L, d), jnp.float32)
    delta = jax.random.uniform(ks[1], (Bsz, L, d), minval=0.0, maxval=0.2)
    A = -jnp.exp(jax.random.normal(ks[2], (d, N)) * 0.5)
    B = jax.random.normal(ks[3], (Bsz, L, N))
    C = jax.random.normal(ks[4], (Bsz, L, N))
    D = jax.random.normal(ks[5], (d,))
    z = jax.random.normal(ks[6], (Bsz, L, d))
    return u, delta, A, B, C, D, z


def test_ref_matches_numpy():
    u, delta, A, B, C, D, z = _random_inputs(jax.random.PRNGKey(0))
    got = selective_scan_ref(u, delta, A, B, C, D, z)
    want = numpy_selective_scan(u, delta, A, B, C, D, z)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("chunk_size", [8, 16, 64])
@pytest.mark.parametrize("L", [1, 7, 16, 37, 128])
def test_chunked_matches_ref(chunk_size, L):
    u, delta, A, B, C, D, z = _random_inputs(jax.random.PRNGKey(1), L=L)
    got = selective_scan(u, delta, A, B, C, D, z, chunk_size=chunk_size)
    want = selective_scan_ref(u, delta, A, B, C, D, z)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_delta_bias_softplus():
    u, delta, A, B, C, D, z = _random_inputs(jax.random.PRNGKey(2))
    delta_bias = jnp.linspace(-1.0, 1.0, u.shape[-1])
    got = selective_scan(u, delta, A, B, C, D, z, delta_bias=delta_bias,
                         delta_softplus=True, chunk_size=16)
    want = numpy_selective_scan(u, delta, A, B, C, D, z, delta_bias=delta_bias,
                                delta_softplus=True)
    # fp32 state accumulation vs the float64 oracle: absolute error grows
    # with softplus'd (larger) deltas; chunked-vs-sequential parity is tested
    # tightly elsewhere.
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-3)
    seq = selective_scan_ref(u, delta, A, B, C, D, z, delta_bias=delta_bias,
                             delta_softplus=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(seq), rtol=1e-5, atol=1e-5)


def test_reverse_is_flip_conjugate():
    u, delta, A, B, C, D, z = _random_inputs(jax.random.PRNGKey(3))
    got = selective_scan(u, delta, A, B, C, D, z, reverse=True, chunk_size=16)
    flip = lambda t: jnp.flip(t, axis=1)
    want = flip(
        selective_scan(flip(u), flip(delta), A, flip(B), flip(C), D, flip(z),
                       chunk_size=16)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_gradients_match_oracle():
    u, delta, A, B, C, D, z = _random_inputs(jax.random.PRNGKey(4), L=32)

    def loss_chunked(args):
        return jnp.sum(jnp.square(selective_scan(*args, chunk_size=8)))

    def loss_ref(args):
        return jnp.sum(jnp.square(selective_scan_ref(*args)))

    args = (u, delta, A, B, C, D, z)
    g1 = jax.grad(loss_chunked)(args)
    g2 = jax.grad(loss_ref)(args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-4)


def test_long_sequence_fp32_state_stability():
    # decays close to 1 accumulate over thousands of steps; chunked scan must
    # agree with sequential at L >> chunk.
    u, delta, A, B, C, D, z = _random_inputs(jax.random.PRNGKey(5), Bsz=1, L=2048, d=4, N=2)
    got = selective_scan(u, delta, A, B, C, D, z, chunk_size=128)
    want = selective_scan_ref(u, delta, A, B, C, D, z)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-4)
