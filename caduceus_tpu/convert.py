"""Reference (HF/torch) checkpoint import/export.

Maps the reference's `CaduceusForMaskedLM` state dict (param names from
`caduceus/modeling_caduceus.py` / `modeling_rcps.py` + mamba-ssm's `Mamba`)
to this framework's param tree and back, enabling *exact* forward-pass
parity testing against released checkpoints (SURVEY.md §7.1: checkpoint
import for parity) and migration of pretrained weights.

Naming (reference, rcps=True):
  caduceus.backbone.embeddings.word_embeddings.embedding.weight   (V, d)
  caduceus.backbone.layers.{i}.norm.weight                        (d,)
  caduceus.backbone.layers.{i}.mixer.submodule.mamba_{fwd,rev}.*  (RCPSWrapper)
  caduceus.backbone.norm_f.weight
  lm_head.lm_head.weight                                          (tied)
rcps=False drops the `.submodule` hop (`Block.mixer` is the BiMambaWrapper)
and uses plain `nn.Embedding` / `lm_head.weight`.

torch Linear weights are (out, in) → transposed to flax (in, out);
Conv1d depthwise weights are (d, 1, K) → (K, d).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _mamba_prefix(i: int, rcps: bool, direction: str) -> str:
    hop = "mixer.submodule" if rcps else "mixer"
    return f"caduceus.backbone.layers.{i}.{hop}.mamba_{direction}"


def import_reference_state_dict(state: Dict[str, np.ndarray], cfg) -> Dict:
    """Reference torch state dict (numpy-valued) → {'params': ...} tree.

    Accepts tied or untied BiMamba; asserts tying consistency when
    `cfg.bidirectional_weight_tie` (the reference shares the tensors, so the
    rev entries either alias or are absent).
    """
    def g(k):
        # rcps + fused_add_norm=False wraps norms in RCPSAddNormWrapper,
        # nesting their params under `.submodule` (`modeling_rcps.py:100-104`,
        # `modeling_caduceus.py:214`); accept both namings
        if k not in state and k.endswith(".weight"):
            alt = k[: -len(".weight")] + ".submodule.weight"
            if alt in state:
                k = alt
        return np.asarray(state[k])

    rcps = cfg.rcps
    params: Dict[str, Any] = {}
    backbone: Dict[str, Any] = {}

    emb_key = (
        "caduceus.backbone.embeddings.word_embeddings.embedding.weight"
        if rcps
        else "caduceus.backbone.embeddings.word_embeddings.weight"
    )
    backbone["embedding"] = g(emb_key)

    for i in range(cfg.n_layer):
        layer: Dict[str, Any] = {
            "norm_w": g(f"caduceus.backbone.layers.{i}.norm.weight")
        }
        fwd_p = _mamba_prefix(i, rcps, "fwd")
        rev_p = _mamba_prefix(i, rcps, "rev")

        def direction(prefix):
            return {
                "conv_w": g(f"{prefix}.conv1d.weight")[:, 0, :].T,  # (d,1,K)->(K,d)
                "conv_b": g(f"{prefix}.conv1d.bias"),
                "x_proj_w": g(f"{prefix}.x_proj.weight").T,
                "dt_proj_w": g(f"{prefix}.dt_proj.weight").T,
                "dt_proj_b": g(f"{prefix}.dt_proj.bias"),
                "A_log": g(f"{prefix}.A_log"),
                "D": g(f"{prefix}.D"),
            }

        mixer: Dict[str, Any] = {
            "fwd": direction(fwd_p),
            "in_proj": {"kernel": g(f"{fwd_p}.in_proj.weight").T},
            "out_proj": {"kernel": g(f"{fwd_p}.out_proj.weight").T},
        }
        if cfg.bidirectional:
            mixer["rev"] = direction(rev_p)
            if cfg.bidirectional_weight_tie:
                # reference ties by aliasing (`modeling_caduceus.py:114-118`)
                if f"{rev_p}.in_proj.weight" in state:
                    np.testing.assert_allclose(
                        g(f"{rev_p}.in_proj.weight"), g(f"{fwd_p}.in_proj.weight"),
                        err_msg="weight-tie mismatch: in_proj",
                    )
            else:
                mixer["in_proj_rev"] = {"kernel": g(f"{rev_p}.in_proj.weight").T}
                mixer["out_proj_rev"] = {"kernel": g(f"{rev_p}.out_proj.weight").T}
        layer["mixer"] = mixer
        backbone[f"layers_{i}"] = layer

    backbone["norm_f_w"] = g("caduceus.backbone.norm_f.weight")
    params["backbone"] = backbone
    # lm_head is tied to the embedding in both frameworks; an untied
    # reference head maps to the 'lm_head' param.
    head_key = "lm_head.lm_head.weight" if rcps else "lm_head.weight"
    if head_key in state and not np.allclose(
        np.asarray(state[head_key]), backbone["embedding"]
    ):
        params["lm_head"] = g(head_key)
    return {"params": params}


def export_reference_state_dict(variables: Dict, cfg) -> Dict[str, np.ndarray]:
    """{'params': ...} tree → reference-named numpy state dict.

    rcps + fused_add_norm=False targets the non-fused reference naming
    (norms wrapped in RCPSAddNormWrapper → `.submodule.weight`)."""
    p = variables["params"]
    rcps = cfg.rcps
    # non-fused rcps wraps every norm in RCPSAddNormWrapper
    norm_hop = (".submodule"
                if rcps and not getattr(cfg, "fused_add_norm", True) else "")
    out: Dict[str, np.ndarray] = {}
    bb = p["backbone"]
    emb = np.asarray(bb["embedding"])
    emb_key = (
        "caduceus.backbone.embeddings.word_embeddings.embedding.weight"
        if rcps
        else "caduceus.backbone.embeddings.word_embeddings.weight"
    )
    out[emb_key] = emb
    out["lm_head.lm_head.weight" if rcps else "lm_head.weight"] = emb

    for i in range(cfg.n_layer):
        layer = bb[f"layers_{i}"]
        out[f"caduceus.backbone.layers.{i}.norm{norm_hop}.weight"] = \
            np.asarray(layer["norm_w"])
        mixer = layer["mixer"]
        fwd_p = _mamba_prefix(i, rcps, "fwd")
        rev_p = _mamba_prefix(i, rcps, "rev")

        def put(prefix, dp, in_proj, out_proj):
            out[f"{prefix}.conv1d.weight"] = np.asarray(dp["conv_w"]).T[:, None, :]
            out[f"{prefix}.conv1d.bias"] = np.asarray(dp["conv_b"])
            out[f"{prefix}.x_proj.weight"] = np.asarray(dp["x_proj_w"]).T
            out[f"{prefix}.dt_proj.weight"] = np.asarray(dp["dt_proj_w"]).T
            out[f"{prefix}.dt_proj.bias"] = np.asarray(dp["dt_proj_b"])
            out[f"{prefix}.A_log"] = np.asarray(dp["A_log"])
            out[f"{prefix}.D"] = np.asarray(dp["D"])
            out[f"{prefix}.in_proj.weight"] = np.asarray(in_proj["kernel"]).T
            out[f"{prefix}.out_proj.weight"] = np.asarray(out_proj["kernel"]).T

        put(fwd_p, mixer["fwd"], mixer["in_proj"], mixer["out_proj"])
        if cfg.bidirectional:
            ip = mixer.get("in_proj_rev", mixer["in_proj"])
            op = mixer.get("out_proj_rev", mixer["out_proj"])
            put(rev_p, mixer["rev"], ip, op)

    out[f"caduceus.backbone.norm_f{norm_hop}.weight"] = np.asarray(bb["norm_f_w"])
    return out


def import_reference_mamba_backbone(
    state: Dict[str, np.ndarray], n_layer: int, prefix: str = "backbone"
) -> Dict:
    """mamba-ssm `MixerModel` state dict (the reference's
    `DNAEmbeddingModelMamba.backbone`, `dna_embedding.py:99-153`) → this
    framework's non-rcps unidirectional `CaduceusBackbone` params."""
    g = lambda k: np.asarray(state[f"{prefix}.{k}"])
    bb: Dict[str, Any] = {"embedding": g("embedding.weight")}
    for i in range(n_layer):
        p = f"layers.{i}.mixer"
        bb[f"layers_{i}"] = {
            "norm_w": g(f"layers.{i}.norm.weight"),
            # unidirectional BiMamba scopes its single MambaMixer under
            # "mamba_fwd" (models/mamba.py:383-384)
            "mixer": {"mamba_fwd": {
                "in_proj": {"kernel": g(f"{p}.in_proj.weight").T},
                "out_proj": {"kernel": g(f"{p}.out_proj.weight").T},
                "fwd": {
                    "conv_w": g(f"{p}.conv1d.weight")[:, 0, :].T,
                    "conv_b": g(f"{p}.conv1d.bias"),
                    "x_proj_w": g(f"{p}.x_proj.weight").T,
                    "dt_proj_w": g(f"{p}.dt_proj.weight").T,
                    "dt_proj_b": g(f"{p}.dt_proj.bias"),
                    "A_log": g(f"{p}.A_log"),
                    "D": g(f"{p}.D"),
                },
            }},
        }
    bb["norm_f_w"] = g("norm_f.weight")
    return {"params": {"backbone": bb}}


def import_reference_hyena_operator(
    state: Dict[str, np.ndarray], prefix: str = "", num_inner_mlps: int = 2
) -> Dict[str, Any]:
    """Reference `HyenaOperator` state dict → this framework's param subtree.

    Naming source: `src/models/sequence/hyena.py` (`in_proj`/`out_proj`
    Linears, depthwise `short_filter` Conv1d, `filter_fn` = HyenaFilter with
    `pos_emb.z`, shared `Sin` freq, `implicit_filter.{0,2,4,...}` Linears and
    `modulation.deltas`). Validated against the reference code executed on
    CPU in tests/test_reference_torch_parity.py.
    """
    p = (prefix + ".") if prefix and not prefix.endswith(".") else prefix
    g = lambda k: np.asarray(state[p + k])
    filt: Dict[str, Any] = {
        "pos_emb_z": g("filter_fn.pos_emb.z")[0],          # (1,L,e) -> (L,e)
        "sin_freq": g("filter_fn.implicit_filter.1.freq")[0],
        "bias": g("filter_fn.bias"),
        "deltas": g("filter_fn.modulation.deltas")[0],     # (1,1,d) -> (1,d)
        "mlp_in": {
            "kernel": g("filter_fn.implicit_filter.0.weight").T,
            "bias": g("filter_fn.implicit_filter.0.bias"),
        },
        "mlp_out": {
            "kernel": g(
                f"filter_fn.implicit_filter.{2 * (num_inner_mlps + 1)}.weight"
            ).T
        },
    }
    for i in range(num_inner_mlps):
        filt[f"mlp_{i}"] = {
            "kernel": g(f"filter_fn.implicit_filter.{2 * (i + 1)}.weight").T,
            "bias": g(f"filter_fn.implicit_filter.{2 * (i + 1)}.bias"),
        }
    return {
        "in_proj": {"kernel": g("in_proj.weight").T, "bias": g("in_proj.bias")},
        "out_proj": {"kernel": g("out_proj.weight").T,
                     "bias": g("out_proj.bias")},
        "short_filter_w": g("short_filter.weight")[:, 0, :].T,  # (C,1,K)->(K,C)
        "short_filter_b": g("short_filter.bias"),
        "filter_fn": filt,
    }


def import_reference_hyena_lm(
    state: Dict[str, np.ndarray], n_layer: int, attn_layer_idx=(),
    num_inner_mlps: int = 2,
) -> Dict:
    """Reference `ConvLMHeadModel` state dict → `HyenaLMHeadModel` params.

    Naming source: `src/models/sequence/long_conv_lm.py` (GPT2Embeddings,
    flash-attn Block norm1/norm2/mixer/mlp, tied lm_head). Validated against
    the reference code executed on CPU (tests/test_reference_torch_parity.py
    via the flash_attn stand-in in tests/torch_shim/).
    """
    g = lambda k: np.asarray(state[k])
    ln = lambda p: {"scale": g(f"{p}.weight"), "bias": g(f"{p}.bias")}
    dense = lambda p: {"kernel": g(f"{p}.weight").T, "bias": g(f"{p}.bias")}
    bb: Dict = {"embedding": g("backbone.embeddings.word_embeddings.weight")}
    if "backbone.embeddings.position_embeddings.weight" in state:
        bb["pos_embedding"] = g("backbone.embeddings.position_embeddings.weight")
    for i in range(n_layer):
        p = f"backbone.layers.{i}"
        bb[f"ln1_{i}"] = ln(f"{p}.norm1")
        bb[f"ln2_{i}"] = ln(f"{p}.norm2")
        if i in attn_layer_idx:
            bb[f"mixer_{i}"] = {"Wqkv": dense(f"{p}.mixer.Wqkv"),
                                "out_proj": dense(f"{p}.mixer.out_proj")}
        else:
            bb[f"mixer_{i}"] = import_reference_hyena_operator(
                state, prefix=f"{p}.mixer", num_inner_mlps=num_inner_mlps
            )
        bb[f"mlp_{i}"] = {"fc1": dense(f"{p}.mlp.fc1"),
                          "fc2": dense(f"{p}.mlp.fc2")}
    bb["ln_f"] = ln("backbone.ln_f")
    return {"params": {"backbone": bb}}


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .bin / .pt state dict into numpy (CPU torch)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.detach().numpy() for k, v in sd.items()}
