"""Hyena backbone tests: fft_conv vs direct convolution, operator shapes,
causality, LM learnability."""

import numpy as np
import jax
import jax.numpy as jnp

from caduceus_tpu.models.hyena import (
    HyenaFilter,
    HyenaLMHeadModel,
    HyenaOperator,
    MHA,
)
from caduceus_tpu.ops.fft_conv import fft_conv


def test_fft_conv_matches_direct():
    rng = np.random.default_rng(0)
    L, d = 17, 3
    u = rng.normal(size=(2, L, d)).astype(np.float32)
    k = rng.normal(size=(L, d)).astype(np.float32)
    D = rng.normal(size=(d,)).astype(np.float32)
    got = np.asarray(fft_conv(jnp.asarray(u), jnp.asarray(k), jnp.asarray(D)))
    want = np.zeros_like(u)
    for t in range(L):
        for s in range(t + 1):
            want[:, t, :] += k[t - s] * u[:, s, :]
    want += u * D
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_fft_conv_is_causal():
    # output at t must not depend on u[t+1:]
    L, d = 16, 4
    u = jnp.zeros((1, L, d))
    k = jax.random.normal(jax.random.PRNGKey(0), (L, d))
    u2 = u.at[0, L - 1, :].set(1.0)  # perturb only the last step
    y1 = fft_conv(u, k)
    y2 = fft_conv(u2, k)
    np.testing.assert_allclose(np.asarray(y1[:, : L - 1]), np.asarray(y2[:, : L - 1]),
                               atol=1e-6)


def test_hyena_filter_shapes():
    filt = HyenaFilter(d_output=8, seq_len=32)
    k, bias = filt.init_with_output(jax.random.PRNGKey(0), 16)[0]
    assert k.shape == (16, 8)
    assert bias.shape == (8,)


def test_hyena_operator_forward_and_causality():
    op = HyenaOperator(d_model=16, l_max=32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 16))
    params = op.init(jax.random.PRNGKey(1), x)
    y = op.apply(params, x)
    assert y.shape == x.shape
    # causality: perturbing the last position leaves earlier outputs unchanged
    x2 = x.at[:, -1, :].add(1.0)
    y2 = op.apply(params, x2)
    np.testing.assert_allclose(np.asarray(y[:, :-1]), np.asarray(y2[:, :-1]),
                               rtol=1e-4, atol=1e-5)


def test_mha_causality():
    m = MHA(d_model=16, num_heads=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 16))
    params = m.init(jax.random.PRNGKey(1), x)
    y = m.apply(params, x)
    x2 = x.at[:, -1, :].add(1.0)
    y2 = m.apply(params, x2)
    np.testing.assert_allclose(np.asarray(y[:, :-1]), np.asarray(y2[:, :-1]),
                               rtol=1e-4, atol=1e-5)


def test_hyena_lm_overfits():
    import optax

    model = HyenaLMHeadModel(d_model=32, n_layer=2, vocab_size=12, l_max=32)
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, 32), 7, 11)
    params = model.init(jax.random.PRNGKey(1), ids)
    logits = model.apply(params, ids)
    assert logits.shape == (2, 32, 12)
    assert logits.dtype == jnp.float32

    # next-token objective on a fixed batch must improve quickly
    x, y = ids[:, :-1], ids[:, 1:]

    def loss_fn(p):
        lg = model.apply(p, x)
        return optax.softmax_cross_entropy_with_integer_labels(lg, y).mean()

    tx = optax.adam(3e-3)
    st = tx.init(params)

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(loss_fn)(p)
        up, s = tx.update(g, s)
        return optax.apply_updates(p, up), s, l

    l0 = None
    for _ in range(40):
        params, st, l = step(params, st)
        l0 = l if l0 is None else l0
    assert float(l) < float(l0) * 0.7


def test_hyena_hybrid_attention_layer():
    model = HyenaLMHeadModel(d_model=16, n_layer=2, vocab_size=12, l_max=16,
                             attn_layer_idx=(1,))
    ids = jnp.zeros((1, 16), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    names = jax.tree_util.tree_leaves_with_path(params)
    flat = ["/".join(str(getattr(p, 'key', p)) for p in path) for path, _ in names]
    assert any("mixer_1" in n and "Wqkv" in n for n in flat)
    assert any("mixer_0" in n and "filter_fn" in n for n in flat)


def test_checkpoint_flags_preserve_function():
    """checkpoint_mixer/checkpoint_mlp (reference long_conv_lm.py:33-39)
    change memory, not math: same logits and grads with/without."""
    from caduceus_tpu.models.hyena import HyenaLMHeadModel

    x = jax.random.randint(jax.random.PRNGKey(0), (2, 32), 0, 12)
    kw = dict(d_model=32, n_layer=2, vocab_size=12, l_max=32,
              attn_layer_idx=(1,), num_heads=4,
              embed_dropout=0.0, resid_dropout=0.0)
    plain = HyenaLMHeadModel(**kw)
    ck = HyenaLMHeadModel(**kw, checkpoint_mixer=True, checkpoint_mlp=True)
    params = plain.init(jax.random.PRNGKey(1), x)

    y0 = plain.apply(params, x)
    y1 = ck.apply(params, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)

    def loss(m):
        return lambda p: jnp.mean(
            jnp.square(m.apply(p, x).astype(jnp.float32)))

    from jax.flatten_util import ravel_pytree
    g0, _ = ravel_pytree(jax.grad(loss(plain))(params))
    g1, _ = ravel_pytree(jax.grad(loss(ck))(params))
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1),
                               atol=1e-6, rtol=1e-5)
