"""Input-encoder registry (reference `src/tasks/encoders.py`)."""

import jax
import jax.numpy as jnp
import numpy as np

from caduceus_tpu.config import CaduceusConfig, SSMConfig
from caduceus_tpu.models.caduceus import CaduceusBackbone
from caduceus_tpu.models.encoders import make_encoder


def _cfg(**kw):
    base = dict(d_model=16, n_layer=1, vocab_size=12, ssm_cfg=SSMConfig(
        d_state=4, d_conv=2, expand=2), rcps=False)
    base.update(kw)
    return CaduceusConfig(**base)


def test_encoder_registry_shapes():
    key = jax.random.PRNGKey(0)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 12, (2, 8)))

    emb = make_encoder("embedding", d_model=16, n_tokens=12)
    p = emb.init(key, ids)
    assert emb.apply(p, ids).shape == (2, 8, 16)

    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 8, 5)),
                    jnp.float32)
    lin = make_encoder("linear", d_model=16, d_input=5)
    p = lin.init(key, x)
    assert lin.apply(p, x).shape == (2, 8, 16)

    oh = make_encoder("onehot", n_tokens=12)
    y = oh.apply({}, ids) if not oh.init(key, ids) else oh.apply(oh.init(key, ids), ids)
    assert y.shape == (2, 8, 12)
    assert float(y.sum()) == ids.size

    comp = make_encoder("onehot", n_tokens=12, d_model=16)
    p = comp.init(key, ids)
    assert comp.apply(p, ids).shape == (2, 8, 16)

    ident = make_encoder("id")
    assert ident.apply({}, ids) is ids


def test_backbone_inputs_embeds_matches_internal_embedding():
    """inputs_embeds == the backbone's own table gather ⇒ identical output."""
    cfg = _cfg()
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 12, (2, 16)))
    bb = CaduceusBackbone(cfg)
    params = bb.init(jax.random.PRNGKey(0), ids)
    h_ids, table = bb.apply(params, ids)
    embeds = jnp.asarray(table)[ids]
    h_emb, _ = bb.apply(params, None, inputs_embeds=embeds)
    np.testing.assert_allclose(np.asarray(h_ids), np.asarray(h_emb),
                               rtol=1e-6, atol=1e-6)


def test_finetune_classifier_with_onehot_encoder():
    """DNAClassifier with a non-identity encoder trains (grad flows through
    the encoder params, backbone embedding unused)."""
    import optax

    from caduceus_tpu.finetune import _make_classifier

    cfg = _cfg()
    model = _make_classifier(cfg, num_labels=2, pooling="mean",
                             use_lengths=False, padding_side="left",
                             encoder="onehot")
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(7, 11, (4, 16)))
    labels = jnp.asarray(rng.integers(0, 2, (4,)))
    params = model.init(jax.random.PRNGKey(0), ids, None)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = {"/".join(str(getattr(k, "key", k)) for k in path)
             for path, _ in flat}
    assert any("encoder" in n for n in names), sorted(names)

    def loss(p):
        logits = model.apply(p, ids, None)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()

    g = jax.grad(loss)(params)
    enc_leaves = [leaf for path, leaf in
                  jax.tree_util.tree_flatten_with_path(g)[0]
                  if any("encoder" in str(getattr(k, "key", k))
                         for k in path)]
    assert enc_leaves and any(float(jnp.abs(l).max()) > 0
                              for l in enc_leaves)
