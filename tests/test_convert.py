"""Checkpoint converter: export→import round trip preserves the forward
pass; reference-shaped dicts import structurally."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from caduceus_tpu.config import CaduceusConfig, SSMConfig
from caduceus_tpu.convert import (
    export_reference_state_dict,
    import_reference_state_dict,
)
from caduceus_tpu.models.caduceus import CaduceusForMaskedLM
from caduceus_tpu.tokenization import CaduceusTokenizer


def cfg_for(rcps=True, tie=True):
    tok = CaduceusTokenizer()
    return CaduceusConfig(
        d_model=16, n_layer=2, vocab_size=tok.vocab_size,
        ssm_cfg=SSMConfig(d_state=4), rcps=rcps,
        bidirectional_weight_tie=tie,
        complement_map=tok.complement_map, dtype="float32", param_dtype="float32",
    )


@pytest.mark.parametrize("rcps", [True, False])
def test_roundtrip_preserves_forward(rcps):
    cfg = cfg_for(rcps=rcps)
    model = CaduceusForMaskedLM(cfg)
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, 24), 0, 12)
    variables = model.init(jax.random.PRNGKey(1), ids)
    ref = model.apply(variables, ids)

    sd = export_reference_state_dict(variables, cfg)
    # every reference tensor name present for the rcps layout
    hop = "mixer.submodule" if rcps else "mixer"
    assert f"caduceus.backbone.layers.0.{hop}.mamba_fwd.A_log" in sd
    assert f"caduceus.backbone.layers.1.{hop}.mamba_rev.conv1d.weight" in sd

    variables2 = import_reference_state_dict(sd, cfg)
    out = model.apply(variables2, ids)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=1e-6)


def test_untied_roundtrip():
    cfg = cfg_for(rcps=True, tie=False)
    model = CaduceusForMaskedLM(cfg)
    ids = jnp.zeros((1, 16), jnp.int32)
    variables = model.init(jax.random.PRNGKey(2), ids)
    sd = export_reference_state_dict(variables, cfg)
    # untied: rev projections differ from fwd
    assert not np.allclose(
        sd["caduceus.backbone.layers.0.mixer.submodule.mamba_rev.in_proj.weight"],
        sd["caduceus.backbone.layers.0.mixer.submodule.mamba_fwd.in_proj.weight"],
    )
    variables2 = import_reference_state_dict(sd, cfg)
    np.testing.assert_allclose(
        np.asarray(model.apply(variables, ids)),
        np.asarray(model.apply(variables2, ids)),
        rtol=1e-6,
    )


def test_torch_layout_shapes():
    """Exported tensors have the reference's torch shapes."""
    cfg = cfg_for()
    model = CaduceusForMaskedLM(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    sd = export_reference_state_dict(variables, cfg)
    d_inner = cfg.d_inner
    p = "caduceus.backbone.layers.0.mixer.submodule.mamba_fwd"
    assert sd[f"{p}.in_proj.weight"].shape == (2 * d_inner, cfg.d_model)
    assert sd[f"{p}.conv1d.weight"].shape == (d_inner, 1, cfg.ssm_cfg.d_conv)
    assert sd[f"{p}.x_proj.weight"].shape == (cfg.dt_rank + 2 * cfg.ssm_cfg.d_state, d_inner)
    assert sd[f"{p}.dt_proj.weight"].shape == (d_inner, cfg.dt_rank)
    assert sd[f"{p}.A_log"].shape == (d_inner, cfg.ssm_cfg.d_state)
    assert sd[f"{p}.out_proj.weight"].shape == (cfg.d_model, d_inner)
    V = cfg.padded_vocab_size
    assert sd["caduceus.backbone.embeddings.word_embeddings.embedding.weight"].shape == (V, cfg.d_model)
