"""Adaptive embedding / projected adaptive log-softmax
(`src/models/nn/adaptive_softmax.py` parity)."""

import jax
import jax.numpy as jnp
import numpy as np

from caduceus_tpu.models.adaptive_softmax import (
    AdaptiveEmbedding,
    ProjectedAdaptiveLogSoftmax,
)


def test_log_probs_normalize():
    m = ProjectedAdaptiveLogSoftmax(n_token=40, d_embed=16, d_proj=16,
                                    cutoffs=(8, 24), div_val=2)
    h = jax.random.normal(jax.random.PRNGKey(0), (6, 16))
    params = m.init(jax.random.PRNGKey(1), h, jnp.zeros(6, jnp.int32))
    lp = m.apply(params, h, method=m.log_prob)
    assert lp.shape == (6, 40)
    np.testing.assert_allclose(np.exp(np.asarray(lp)).sum(-1), 1.0, rtol=1e-5)


def test_no_cutoffs_equals_dense_softmax():
    """With no tail clusters the head IS a dense softmax over the vocab."""
    m = ProjectedAdaptiveLogSoftmax(n_token=12, d_embed=16, d_proj=16)
    h = jax.random.normal(jax.random.PRNGKey(2), (4, 16))
    tgt = jax.random.randint(jax.random.PRNGKey(3), (4,), 0, 12)
    params = m.init(jax.random.PRNGKey(1), h, tgt)
    w = params["params"]["out_0"]
    b = params["params"]["bias_0"]
    want = jax.nn.log_softmax(h @ w.T + b, axis=-1)
    got = m.apply(params, h, method=m.log_prob)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-6)
    nll = m.apply(params, h, tgt)
    np.testing.assert_allclose(
        np.asarray(nll),
        -np.take_along_axis(np.asarray(want), np.asarray(tgt)[:, None], 1)[:, 0],
        rtol=1e-5,
    )


def test_adaptive_embedding_shapes_and_clusters():
    m = AdaptiveEmbedding(n_token=40, d_embed=16, d_proj=8, cutoffs=(8, 24),
                          div_val=2)
    ids = jnp.asarray([[0, 7, 8, 23, 24, 39]])
    params = m.init(jax.random.PRNGKey(0), ids)
    out = m.apply(params, ids)
    assert out.shape == (1, 6, 8)
    # per-cluster tables have shrinking widths 16, 8, 4
    p = params["params"]
    assert p["emb_0"].shape == (8, 16)
    assert p["emb_1"].shape == (16, 8)
    assert p["emb_2"].shape == (16, 4)
    # distinct ids in distinct clusters give distinct embeddings
    o = np.asarray(out[0])
    assert not np.allclose(o[0], o[2]) and not np.allclose(o[2], o[4])


def test_adaptive_lm_task_trains():
    """AdaptiveLMTask-style training step decreases NLL
    (`src/tasks/tasks.py:335-382`)."""
    import optax

    V, D = 32, 16
    emb = AdaptiveEmbedding(n_token=V, d_embed=D, d_proj=D, cutoffs=(8,),
                            div_val=2)
    head = ProjectedAdaptiveLogSoftmax(n_token=V, d_embed=D, d_proj=D,
                                       cutoffs=(8,), div_val=2)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, V, (8, 16)))

    import flax.linen as nn

    class LM(nn.Module):
        @nn.compact
        def __call__(self, x, y):
            h = AdaptiveEmbedding(V, D, D, (8,), 2, name="emb")(x)
            h = nn.Dense(D)(h)
            return ProjectedAdaptiveLogSoftmax(V, D, D, (8,), 2,
                                               name="head")(h, y).mean()

    model = LM()
    params = model.init(jax.random.PRNGKey(0), ids, ids)
    tx = optax.adam(1e-2)
    opt = tx.init(params)
    loss0 = float(model.apply(params, ids, ids))

    @jax.jit
    def step(p, o):
        l, g = jax.value_and_grad(lambda p: model.apply(p, ids, ids))(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    for _ in range(30):
        params, opt, loss = step(params, opt)
    assert float(loss) < loss0 - 0.5
