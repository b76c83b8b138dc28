"""Sequence-parallel scan vs single-device full-sequence scan (8-dev mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from caduceus_tpu.ops.selective_scan import selective_scan
from caduceus_tpu.parallel.mesh import make_mesh
from caduceus_tpu.parallel.seq_scan import sequence_parallel_scan


def _inputs(key, G=2, L=256, d=16, N=4):
    ks = jax.random.split(key, 7)
    u = jax.random.normal(ks[0], (G, L, d), jnp.float32)
    delta = jax.random.normal(ks[1], (G, L, d)) * 0.5
    A = -jnp.exp(jax.random.normal(ks[2], (d, N)) * 0.5)
    B = jax.random.normal(ks[3], (G, L, N))
    C = jax.random.normal(ks[4], (G, L, N))
    D = jax.random.normal(ks[5], (d,))
    bias = jax.random.normal(ks[6], (d,)) * 0.1
    return u, delta, A, B, C, D, bias


@pytest.mark.parametrize("reverse", [False, True])
def test_seq_parallel_matches_full(reverse):
    assert jax.device_count() >= 8
    mesh = make_mesh(jax.devices()[:8])
    u, delta, A, B, C, D, bias = _inputs(jax.random.PRNGKey(0))
    got = sequence_parallel_scan(
        u, delta, A, B, C, D=D, delta_bias=bias, delta_softplus=True,
        reverse=reverse, mesh=mesh, axis="data", chunk_size=16,
    )
    want = selective_scan(u, delta, A, B, C, D=D, delta_bias=bias,
                          delta_softplus=True, reverse=reverse, chunk_size=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_seq_parallel_with_gate():
    mesh = make_mesh(jax.devices()[:8])
    u, delta, A, B, C, D, bias = _inputs(jax.random.PRNGKey(1))
    z = jax.random.normal(jax.random.PRNGKey(2), u.shape)
    got = sequence_parallel_scan(
        u, delta, A, B, C, D=D, z=z, delta_bias=bias, delta_softplus=True,
        mesh=mesh, chunk_size=16,
    )
    want = selective_scan(u, delta, A, B, C, D=D, z=z, delta_bias=bias,
                          delta_softplus=True, chunk_size=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_h_init_and_final_state_contract():
    """Segmented scan == full scan when chained via h_init/final state."""
    u, delta, A, B, C, D, bias = _inputs(jax.random.PRNGKey(3), L=64)
    full = selective_scan(u, delta, A, B, C, D=D, delta_bias=bias,
                          delta_softplus=True, chunk_size=16)
    y1, h = selective_scan(u[:, :32], delta[:, :32], A, B[:, :32], C[:, :32],
                           D=D, delta_bias=bias, delta_softplus=True,
                           chunk_size=16, return_final_state=True)
    y2 = selective_scan(u[:, 32:], delta[:, 32:], A, B[:, 32:], C[:, 32:],
                        D=D, delta_bias=bias, delta_softplus=True,
                        chunk_size=16, h_init=h)
    np.testing.assert_allclose(np.asarray(jnp.concatenate([y1, y2], axis=1)),
                               np.asarray(full), rtol=1e-4, atol=1e-5)


def test_final_state_with_ragged_padding():
    """Padded (non-multiple) lengths must not decay the final state."""
    u, delta, A, B, C, D, bias = _inputs(jax.random.PRNGKey(4), L=40)
    _, h_ragged = selective_scan(u, delta, A, B, C, D=D, delta_bias=bias,
                                 delta_softplus=True, chunk_size=16,
                                 return_final_state=True)
    _, h_exact = selective_scan(u, delta, A, B, C, D=D, delta_bias=bias,
                                delta_softplus=True, chunk_size=40,
                                return_final_state=True)
    np.testing.assert_allclose(np.asarray(h_ragged), np.asarray(h_exact),
                               rtol=1e-4, atol=1e-5)
