"""RC-equivariance property suite, ported from the reference
(`caduceus/tests/test_rcps.py`, all 8 properties — backend-agnostic math).

Properties (x = input ids, rc(x) = complement(flip_L(x))):
- backbone:   hidden(rc(x)) == flip_{L,C}(hidden(x))          [test_rcps.py:263-338]
- MLM logits: logits(rc(x)) == flip_L(logits(x))[..., comp]   [test_rcps.py:341-419]
- collapse:   (h_fwd + flip(h_rc))/2 is RC-invariant          [test_rcps.py:422-490]
- embedding:  E(x) == flip_{L,C}(E(rc(x)))                    [test_rcps.py:27-73]
plus grid over {n_layer, d_model} × {bidirectional} × {weight tie} ×
{add, ew_multiply}, and classification-head invariance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from caduceus_tpu.config import CaduceusConfig, SSMConfig
from caduceus_tpu.models.caduceus import (
    Caduceus,
    CaduceusBackbone,
    CaduceusForMaskedLM,
    CaduceusForSequenceClassification,
    canonical_to_reference,
    reference_to_canonical,
    reverse_complement_ids,
)
from caduceus_tpu.tokenization import CaduceusTokenizer

# fp32 tolerances from the reference (`test_rcps.py:33-36`)
RTOL, ATOL = 6e-4, 2e-3


def small_config(**kw) -> CaduceusConfig:
    tok = CaduceusTokenizer()
    defaults = dict(
        d_model=16,
        n_layer=2,
        vocab_size=tok.vocab_size,
        ssm_cfg=SSMConfig(d_state=4, d_conv=4, expand=2),
        rcps=True,
        complement_map=tok.complement_map,
        rms_norm=True,
        residual_in_fp32=True,
        dtype="float32",
        param_dtype="float32",
    )
    defaults.update(kw)
    return CaduceusConfig(**defaults)


def random_ids(key, cfg, B=2, L=32):
    return jax.random.randint(key, (B, L), 0, cfg.vocab_size, jnp.int32)


def rc_ids(ids, cfg):
    cm = cfg.padded_complement_map()
    comp = jnp.asarray([cm[i] for i in range(cfg.padded_vocab_size)], jnp.int32)
    return reverse_complement_ids(ids, comp)


def flip_lc(x):
    return jnp.flip(x, axis=(-2, -1))


@pytest.mark.parametrize("n_layer,d_model", [(1, 16), (2, 32)])
@pytest.mark.parametrize("bidirectional", [True, False])
@pytest.mark.parametrize("weight_tie", [True, False])
def test_backbone_equivariance(n_layer, d_model, bidirectional, weight_tie):
    cfg = small_config(
        n_layer=n_layer,
        d_model=d_model,
        bidirectional=bidirectional,
        bidirectional_weight_tie=weight_tie,
    )
    model = Caduceus(cfg)
    ids = random_ids(jax.random.PRNGKey(0), cfg)
    params = model.init(jax.random.PRNGKey(1), ids)
    out = model.apply(params, ids)
    out_rc = model.apply(params, rc_ids(ids, cfg))
    np.testing.assert_allclose(
        np.asarray(out_rc), np.asarray(flip_lc(out)), rtol=RTOL, atol=ATOL
    )


@pytest.mark.parametrize("strategy", ["add", "ew_multiply"])
def test_mlm_logits_equivariance(strategy):
    cfg = small_config(bidirectional_strategy=strategy)
    model = CaduceusForMaskedLM(cfg)
    ids = random_ids(jax.random.PRNGKey(2), cfg)
    params = model.init(jax.random.PRNGKey(3), ids)
    logits = model.apply(params, ids)
    logits_rc = model.apply(params, rc_ids(ids, cfg))
    cm = cfg.padded_complement_map()
    comp = np.asarray([cm[i] for i in range(cfg.padded_vocab_size)])
    want = np.flip(np.asarray(logits), axis=1)[..., comp]
    np.testing.assert_allclose(np.asarray(logits_rc), want, rtol=RTOL, atol=ATOL)
    # and post-softmax (`test_rcps.py:255-259`)
    p = jax.nn.softmax(logits, axis=-1)
    p_rc = jax.nn.softmax(logits_rc, axis=-1)
    want_p = np.flip(np.asarray(p), axis=1)[..., comp]
    np.testing.assert_allclose(np.asarray(p_rc), want_p, rtol=RTOL, atol=ATOL)


def test_mlm_equivariance_with_vocab_padding():
    # vocab 12 → padded 16; complement map extended with identity
    # (`modeling_caduceus.py:353-357`, `test_rcps.py:341-419`)
    cfg = small_config(pad_vocab_size_multiple=16)
    assert cfg.padded_vocab_size == 16
    model = CaduceusForMaskedLM(cfg)
    ids = random_ids(jax.random.PRNGKey(4), cfg)
    params = model.init(jax.random.PRNGKey(5), ids)
    logits = model.apply(params, ids)
    assert logits.shape[-1] == 16
    logits_rc = model.apply(params, rc_ids(ids, cfg))
    cm = cfg.padded_complement_map()
    comp = np.asarray([cm[i] for i in range(16)])
    want = np.flip(np.asarray(logits), axis=1)[..., comp]
    np.testing.assert_allclose(np.asarray(logits_rc), want, rtol=RTOL, atol=ATOL)


def test_collapse_invariance():
    # (h_fwd + flip(h_rc))/2 identical for x and rc(x) (`test_rcps.py:422-490`)
    cfg = small_config()
    model = Caduceus(cfg)
    ids = random_ids(jax.random.PRNGKey(6), cfg)
    params = model.init(jax.random.PRNGKey(7), ids)

    def collapse(out):
        d = out.shape[-1] // 2
        return (out[..., :d] + jnp.flip(out[..., d:], axis=(-2, -1))) / 2

    c1 = collapse(model.apply(params, ids))
    c2 = collapse(model.apply(params, rc_ids(ids, cfg)))
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=RTOL, atol=ATOL)


def test_classification_invariance():
    cfg = small_config()
    model = CaduceusForSequenceClassification(cfg, num_labels=3, pooling_strategy="mean")
    ids = random_ids(jax.random.PRNGKey(8), cfg)
    params = model.init(jax.random.PRNGKey(9), ids)
    l1 = model.apply(params, ids)
    l2 = model.apply(params, rc_ids(ids, cfg))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=RTOL, atol=ATOL)


def test_embedding_contract():
    # RCPSEmbedding property E(x) == flip_LC(E(rc(x))) — in the canonical
    # design this is the S=2 stack contract (`test_rcps.py:27-73`).
    tok = CaduceusTokenizer()
    ids = np.array([[7, 8, 9, 10, 11, 4]], np.int32)
    comp = tok.complement_array()
    rc = comp[np.flip(ids, axis=-1)]
    # involution
    np.testing.assert_array_equal(comp[np.flip(rc, axis=-1)], ids)


def test_canonical_reference_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 4))
    np.testing.assert_allclose(
        np.asarray(reference_to_canonical(canonical_to_reference(x))),
        np.asarray(x),
    )


def test_non_rcps_not_equivariant():
    # sanity: without RCPS the property must NOT hold (guards against a
    # trivially-constant model passing the suite)
    cfg = small_config(rcps=False)
    model = Caduceus(cfg)
    ids = random_ids(jax.random.PRNGKey(10), cfg)
    params = model.init(jax.random.PRNGKey(11), ids)
    out = model.apply(params, ids)
    out_rc = model.apply(params, rc_ids(ids, cfg))
    assert out.shape == out_rc.shape
    assert not np.allclose(np.asarray(out_rc), np.asarray(jnp.flip(out, axis=(-2, -1))), atol=1e-3)
