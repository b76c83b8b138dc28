"""Model smoke tests: shapes, param structure, fusion algebra, overfit."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from caduceus_tpu.config import CaduceusConfig, SSMConfig
from caduceus_tpu.models.caduceus import Caduceus, CaduceusForMaskedLM
from caduceus_tpu.models.mamba import BiMamba
from caduceus_tpu.tokenization import CaduceusTokenizer


def tiny_cfg(**kw):
    tok = CaduceusTokenizer()
    d = dict(
        d_model=16,
        n_layer=2,
        vocab_size=tok.vocab_size,
        ssm_cfg=SSMConfig(d_state=4),
        complement_map=tok.complement_map,
        rcps=True,
        dtype="float32",
        param_dtype="float32",
    )
    d.update(kw)
    return CaduceusConfig(**d)


def test_shapes_rcps():
    cfg = tiny_cfg()
    model = Caduceus(cfg)
    ids = jnp.zeros((2, 24), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    out = model.apply(params, ids)
    assert out.shape == (2, 24, 2 * cfg.d_model)


def test_shapes_plain():
    cfg = tiny_cfg(rcps=False)
    model = Caduceus(cfg)
    ids = jnp.zeros((2, 24), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    out = model.apply(params, ids)
    assert out.shape == (2, 24, cfg.d_model)


def test_mlm_logits_fp32_and_tied():
    cfg = tiny_cfg(dtype="bfloat16")
    model = CaduceusForMaskedLM(cfg, tie_word_embeddings=True)
    ids = jnp.zeros((1, 16), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    logits = model.apply(params, ids)
    assert logits.dtype == jnp.float32
    assert logits.shape == (1, 16, cfg.padded_vocab_size)
    # tied: no separate lm_head param
    flat = jax.tree_util.tree_leaves_with_path(params)
    names = ["/".join(str(p) for p in path) for path, _ in flat]
    assert not any("lm_head" in n for n in names)


def test_bimamba_tie_param_structure():
    cfg = tiny_cfg(rcps=False)
    m = BiMamba(cfg)
    x = jnp.zeros((2, 8, cfg.d_model))
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    assert "in_proj" in params and "out_proj" in params
    assert "in_proj_rev" not in params  # tied
    cfg2 = tiny_cfg(rcps=False, bidirectional_weight_tie=False)
    params2 = BiMamba(cfg2).init(jax.random.PRNGKey(0), x)["params"]
    assert "in_proj_rev" in params2 and "out_proj_rev" in params2


def test_bimamba_fusion_algebra():
    """Fused (tied+add) path == explicit per-direction gate+project."""
    cfg = tiny_cfg(rcps=False)
    m = BiMamba(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 12, cfg.d_model))
    variables = m.init(jax.random.PRNGKey(2), x)
    fused = m.apply(variables, x)

    # manual: replicate reference BiMambaWrapper with the same params
    from caduceus_tpu.models.mamba import ssm_branch

    p = variables["params"]
    Wi = p["in_proj"]["kernel"]
    Wo = p["out_proj"]["kernel"]

    def direction(dp, xz, reverse):
        xi, z = jnp.split(xz, 2, axis=-1)
        y = ssm_branch(
            xi, dp["conv_w"], dp["conv_b"], dp["x_proj_w"], dp["dt_proj_w"],
            dp["dt_proj_b"], dp["A_log"], dp["D"],
            dt_rank=cfg.dt_rank, d_state=cfg.ssm_cfg.d_state, reverse=reverse,
        )
        return (y * jax.nn.silu(z)) @ Wo

    xz = x @ Wi
    manual = direction(p["fwd"], xz, False) + direction(p["rev"], xz, True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(manual), rtol=1e-4, atol=1e-5)


def test_reverse_direction_matches_flip():
    """rev-direction branch == flip(fwd-math(flip(x))) with same params."""
    cfg = tiny_cfg(rcps=False, bidirectional=False)
    from caduceus_tpu.models.mamba import ssm_branch

    key = jax.random.PRNGKey(3)
    d_inner = cfg.d_inner
    x = jax.random.normal(key, (2, 10, d_inner))
    ks = jax.random.split(key, 8)
    conv_w = jax.random.normal(ks[0], (4, d_inner)) * 0.4
    conv_b = jax.random.normal(ks[1], (d_inner,)) * 0.1
    x_proj_w = jax.random.normal(ks[2], (d_inner, cfg.dt_rank + 2 * cfg.ssm_cfg.d_state)) * 0.2
    dt_proj_w = jax.random.normal(ks[3], (cfg.dt_rank, d_inner)) * 0.2
    dt_proj_b = jax.random.normal(ks[4], (d_inner,)) * 0.1
    A_log = jnp.log(jnp.tile(jnp.arange(1, cfg.ssm_cfg.d_state + 1, dtype=jnp.float32), (d_inner, 1)))
    D = jnp.ones((d_inner,))
    args = (conv_w, conv_b, x_proj_w, dt_proj_w, dt_proj_b, A_log, D)

    rev = ssm_branch(x, *args, dt_rank=cfg.dt_rank, d_state=cfg.ssm_cfg.d_state, reverse=True)
    flip = lambda t: jnp.flip(t, axis=-2)
    want = flip(ssm_branch(flip(x), *args, dt_rank=cfg.dt_rank, d_state=cfg.ssm_cfg.d_state, reverse=False))
    np.testing.assert_allclose(np.asarray(rev), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_mlm_overfits_tiny_batch():
    """End-to-end learnability: loss drops sharply when memorizing one batch."""
    cfg = tiny_cfg()
    model = CaduceusForMaskedLM(cfg)
    key = jax.random.PRNGKey(0)
    ids = jax.random.randint(key, (2, 32), 7, 11, jnp.int32)
    targets = ids
    params = model.init(jax.random.PRNGKey(1), ids)

    def loss_fn(p):
        logits = model.apply(p, ids)
        return optax.softmax_cross_entropy_with_integer_labels(logits, targets).mean()

    tx = optax.adam(1e-2)
    state = tx.init(params)

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(g, s)
        return optax.apply_updates(p, updates), s, l

    l0 = None
    for i in range(60):
        params, state, l = step(params, state)
        if l0 is None:
            l0 = l
    assert float(l) < float(l0) * 0.5, (float(l0), float(l))


@pytest.mark.parametrize("n_layer", [2, 3])
@pytest.mark.parametrize("tie,strategy", [
    (True, "add"), (True, "ew_multiply"), (False, "add"),
])
def test_fused_frame_conjugation_matches_data_impl(
        monkeypatch, n_layer, tie, strategy):
    """The parameter-side fused-frame realization ("params": conjugated
    blocks — flipped norm/projection params + swapped scan directions) must
    compute the SAME function as the data-movement realization ("data":
    swap_rc per block), for even and odd layer counts and all weight-tie /
    combine configurations."""
    cfg = tiny_cfg(n_layer=n_layer, fused_add_norm=True,
                   bidirectional_weight_tie=tie,
                   bidirectional_strategy=strategy)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 24), 7, 11)

    monkeypatch.setenv("CADUCEUS_FUSED_FRAME_IMPL", "data")
    model = CaduceusForMaskedLM(cfg)
    params = model.init(jax.random.PRNGKey(0), ids)
    want = model.apply(params, ids)

    monkeypatch.setenv("CADUCEUS_FUSED_FRAME_IMPL", "params")
    got = CaduceusForMaskedLM(cfg).apply(params, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_frame_conjugation_matches_data_impl_v2(monkeypatch):
    """Same equivalence for the Mamba-2 (SSD) mixer family."""
    cfg = tiny_cfg(
        n_layer=3, fused_add_norm=True,
        ssm_cfg=SSMConfig(version=2, d_state=8, headdim=8, ssd_chunk_size=8),
    )
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 24), 7, 11)

    monkeypatch.setenv("CADUCEUS_FUSED_FRAME_IMPL", "data")
    model = CaduceusForMaskedLM(cfg)
    params = model.init(jax.random.PRNGKey(0), ids)
    want = model.apply(params, ids)

    monkeypatch.setenv("CADUCEUS_FUSED_FRAME_IMPL", "params")
    got = CaduceusForMaskedLM(cfg).apply(params, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_frame_conjugation_grads_match(monkeypatch):
    """Parameter gradients agree between the two frame realizations."""
    cfg = tiny_cfg(n_layer=2, fused_add_norm=True)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 24), 7, 11)

    monkeypatch.setenv("CADUCEUS_FUSED_FRAME_IMPL", "data")
    model_d = CaduceusForMaskedLM(cfg)
    params = model_d.init(jax.random.PRNGKey(0), ids)

    def loss(model):
        def f(p):
            return jnp.mean(jnp.square(model.apply(p, ids)))
        return f

    g_d = jax.grad(loss(model_d))(params)
    monkeypatch.setenv("CADUCEUS_FUSED_FRAME_IMPL", "params")
    g_p = jax.grad(loss(CaduceusForMaskedLM(cfg)))(params)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_p),
            jax.tree_util.tree_leaves_with_path(g_d)):
        s = float(np.abs(np.asarray(b)).max()) + 1e-9
        np.testing.assert_allclose(
            np.asarray(a) / s, np.asarray(b) / s, atol=1e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(ka)}")
