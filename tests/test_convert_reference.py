"""Checkpoint-import parity against an independent numpy executor of the
REFERENCE call stack (VERDICT r1 missing-#1 / next-#2c).

`_ref_forward_rcps` re-implements, directly from the reference sources and
in the reference's own structure (wrappers + flips, no canonical-strand
reformulation):
  RCPSEmbedding            `caduceus/modeling_rcps.py:54-67`
  RCPSAddNormWrapper       `modeling_rcps.py:100-129` (non-fused path)
  RCPSWrapper(BiMamba)     `modeling_rcps.py:85-99` + `modeling_caduceus.py:122-140`
  Mamba slow path          mamba-ssm 1.2.0 `mamba_simple.py` equations
  final norm_f (rcps)      `modeling_caduceus.py:233-238`
  RCPSLMHead               `modeling_rcps.py:233-246`

A hand-built reference-NAMED state dict (torch tensor layouts: Linear
(out,in), Conv1d (d,1,K)) is run through BOTH this executor and
`convert.import_reference_state_dict` → `CaduceusForMaskedLM`; logits must
agree. This validates the name map, the transposes, and the
canonical-strand reformulation against the reference equations.
"""

import numpy as np
import jax
import pytest

from caduceus_tpu.config import CaduceusConfig, SSMConfig
from caduceus_tpu.convert import import_reference_state_dict
from caduceus_tpu.models.caduceus import CaduceusForMaskedLM
from caduceus_tpu.tokenization import CaduceusTokenizer


def _cfg(rcps=True, tie=True):
    tok = CaduceusTokenizer()
    return CaduceusConfig(
        d_model=16, n_layer=2, vocab_size=tok.vocab_size,
        ssm_cfg=SSMConfig(d_state=4, use_kernel="xla"),
        rcps=rcps, bidirectional=True, bidirectional_weight_tie=tie,
        complement_map=tok.complement_map,
        rms_norm=True, residual_in_fp32=True,
        # this file's numpy executor implements the reference's NON-fused
        # block frame (RCPSAddNormWrapper); the fused frame is covered by
        # tests/test_reference_torch_parity.py against the real torch code
        fused_add_norm=False,
        dtype="float32", param_dtype="float32",
    )


def _build_reference_state(cfg, rng):
    """Random reference-layout state dict (numpy, torch conventions)."""
    d, di, N = cfg.d_model, cfg.d_inner, cfg.ssm_cfg.d_state
    dtr, K, V = cfg.dt_rank, cfg.ssm_cfg.d_conv, cfg.padded_vocab_size
    r = lambda *s: rng.standard_normal(s).astype(np.float64) * 0.1
    state = {}
    emb = r(V, d)
    emb_key = (
        "caduceus.backbone.embeddings.word_embeddings.embedding.weight"
        if cfg.rcps else "caduceus.backbone.embeddings.word_embeddings.weight"
    )
    state[emb_key] = emb
    state["lm_head.lm_head.weight" if cfg.rcps else "lm_head.weight"] = emb

    hop = "mixer.submodule" if cfg.rcps else "mixer"
    for i in range(cfg.n_layer):
        state[f"caduceus.backbone.layers.{i}.norm.weight"] = 1.0 + r(d)
        shared_in = r(2 * di, d)
        shared_out = r(d, di)
        for direction in ("fwd", "rev"):
            p = f"caduceus.backbone.layers.{i}.{hop}.mamba_{direction}"
            state[f"{p}.in_proj.weight"] = shared_in     # tied (aliasing)
            state[f"{p}.out_proj.weight"] = shared_out
            state[f"{p}.conv1d.weight"] = r(di, 1, K)
            state[f"{p}.conv1d.bias"] = r(di)
            state[f"{p}.x_proj.weight"] = r(dtr + 2 * N, di)
            state[f"{p}.dt_proj.weight"] = r(di, dtr)
            state[f"{p}.dt_proj.bias"] = r(di)
            state[f"{p}.A_log"] = np.log(
                np.tile(np.arange(1, N + 1, dtype=np.float64), (di, 1))
            )
            state[f"{p}.D"] = 1.0 + r(di)
    state["caduceus.backbone.norm_f.weight"] = 1.0 + r(d)
    return state


# --------------------------------------------------------------------------
# Reference equations in numpy (fp64)
# --------------------------------------------------------------------------

def _softplus(x):
    return np.log1p(np.exp(-np.abs(x))) + np.maximum(x, 0)


def _silu(x):
    return x / (1.0 + np.exp(-x))


def _rms_norm(x, w, eps=1e-5):
    var = np.mean(np.square(x), axis=-1, keepdims=True)
    return x / np.sqrt(var + eps) * w


def _mamba_slow(state, prefix, x):
    """mamba-ssm 1.2.0 `Mamba` forward, slow-path equations. x: (B, L, d)."""
    g = lambda k: state[f"{prefix}.{k}"]
    B_, L, _ = x.shape
    xz = x @ g("in_proj.weight").T                 # (B, L, 2di)
    di = xz.shape[-1] // 2
    xi, z = xz[..., :di], xz[..., di:]
    # depthwise causal conv, torch Conv1d(groups=di, padding=K-1)[..., :L]
    w = g("conv1d.weight")[:, 0, :]                # (di, K)
    K = w.shape[1]
    xc = np.zeros_like(xi)
    for k in range(K):
        shift = K - 1 - k
        xc[:, shift:, :] += xi[:, : L - shift if shift else L, :] * w[:, k]
    xc = _silu(xc + g("conv1d.bias"))
    dbc = xc @ g("x_proj.weight").T
    dtr = g("dt_proj.weight").shape[1]
    N = (dbc.shape[-1] - dtr) // 2
    dt, Bv, Cv = dbc[..., :dtr], dbc[..., dtr:dtr + N], dbc[..., dtr + N:]
    delta = _softplus(dt @ g("dt_proj.weight").T + g("dt_proj.bias"))
    A = -np.exp(g("A_log"))                        # (di, N)
    h = np.zeros((B_, di, N))
    ys = np.empty((B_, L, di))
    for t in range(L):
        h = np.exp(delta[:, t, :, None] * A) * h + (
            delta[:, t, :, None] * xc[:, t, :, None] * Bv[:, t, None, :]
        )
        ys[:, t] = np.sum(h * Cv[:, t, None, :], axis=-1)
    ys = ys + g("D") * xc
    return (ys * _silu(z)) @ g("out_proj.weight").T


def _bimamba(state, prefix, x):
    """BiMambaWrapper.forward, strategy 'add' (`modeling_caduceus.py:122-140`)."""
    out = _mamba_slow(state, f"{prefix}.mamba_fwd", x)
    out_rev = _mamba_slow(state, f"{prefix}.mamba_rev", x[:, ::-1])[:, ::-1]
    return out + out_rev


def _rc(x):
    """flip length + channels (`modeling_rcps.py:80-83`)."""
    return x[:, ::-1, ::-1]


def _ref_forward_rcps(state, cfg, ids):
    comp_map = cfg.padded_complement_map()
    comp = np.array([comp_map[i] for i in range(cfg.padded_vocab_size)])
    emb = state["caduceus.backbone.embeddings.word_embeddings.embedding.weight"]
    d = cfg.d_model

    # RCPSEmbedding: cat[E(x), rc(E(rc_ids(x)))]
    rc_ids = comp[ids[:, ::-1]]
    h = np.concatenate([emb[ids], _rc(emb[rc_ids])], axis=-1)  # (B, L, 2d)

    residual = None
    for i in range(cfg.n_layer):
        w = state[f"caduceus.backbone.layers.{i}.norm.weight"]
        # RCPSAddNormWrapper, prenorm=True (`modeling_rcps.py:105-129`)
        if residual is None:
            residual = h
            x_fwd = _rms_norm(h[..., :d], w)
            x_rc = _rms_norm(_rc(h[..., d:]), w)
        else:
            res_fwd = h[..., :d] + residual[..., :d]
            x_fwd = _rms_norm(res_fwd, w)
            res_rc = _rc(h[..., d:]) + _rc(residual[..., d:])
            x_rc = _rms_norm(res_rc, w)
            residual = np.concatenate([res_fwd, _rc(res_rc)], axis=-1)
        normed = np.concatenate([x_fwd, _rc(x_rc)], axis=-1)
        # RCPSWrapper(BiMambaWrapper) (`modeling_rcps.py:85-99`)
        pre = f"caduceus.backbone.layers.{i}.mixer.submodule"
        out_fwd = _bimamba(state, pre, normed[..., :d])
        out_rc = _bimamba(state, pre, _rc(normed[..., d:]))
        h = np.concatenate([out_fwd, _rc(out_rc)], axis=-1)

    # final norm_f, rcps path (`modeling_caduceus.py:233-238` non-fused ==
    # RCPSAddNormWrapper with residual, prenorm=False)
    wf = state["caduceus.backbone.norm_f.weight"]
    hf = _rms_norm(h[..., :d] + residual[..., :d], wf)
    hr = _rms_norm(_rc(h[..., d:]) + _rc(residual[..., d:]), wf)
    hidden = np.concatenate([hf, _rc(hr)], axis=-1)

    # RCPSLMHead (`modeling_rcps.py:233-246`): channel-only flip on rc half
    W = state["lm_head.lm_head.weight"]
    fwd_logits = hidden[..., :d] @ W.T
    rc_logits = hidden[..., d:][..., ::-1] @ W[comp, :].T
    return fwd_logits + rc_logits


def _ref_forward_plain(state, cfg, ids):
    """Non-RCPS reference stack: Block(norm → BiMambaWrapper) + tied head."""
    emb = state["caduceus.backbone.embeddings.word_embeddings.weight"]
    h = emb[ids]
    residual = None
    for i in range(cfg.n_layer):
        w = state[f"caduceus.backbone.layers.{i}.norm.weight"]
        residual = h if residual is None else h + residual
        normed = _rms_norm(residual, w)
        h = _bimamba(state, f"caduceus.backbone.layers.{i}.mixer", normed)
    wf = state["caduceus.backbone.norm_f.weight"]
    hidden = _rms_norm(h + residual, wf)
    return hidden @ state["lm_head.weight"].T


@pytest.mark.parametrize("rcps", [True, False])
def test_import_matches_reference_equations(rcps):
    cfg = _cfg(rcps=rcps)
    rng = np.random.default_rng(0)
    state = _build_reference_state(cfg, rng)
    B, L = 2, 24
    ids = rng.integers(7, 11, (B, L)).astype(np.int32)

    want = (_ref_forward_rcps if rcps else _ref_forward_plain)(state, cfg, ids)

    params = import_reference_state_dict(state, cfg)
    model = CaduceusForMaskedLM(cfg)
    got = np.asarray(model.apply(params, ids), np.float64)

    assert got.shape == want.shape
    scale = np.abs(want).max() + 1e-9
    np.testing.assert_allclose(got / scale, want / scale, atol=2e-5,
                               err_msg=f"rcps={rcps}")


def test_import_then_equivariance():
    """Imported reference weights preserve the RC-equivariance property
    (`caduceus/tests/test_rcps.py:408-419`)."""
    cfg = _cfg(rcps=True)
    rng = np.random.default_rng(1)
    state = _build_reference_state(cfg, rng)
    params = import_reference_state_dict(state, cfg)
    model = CaduceusForMaskedLM(cfg)
    ids = rng.integers(7, 11, (1, 16)).astype(np.int32)
    comp_map = cfg.padded_complement_map()
    comp = np.array([comp_map[i] for i in range(cfg.padded_vocab_size)])
    rc_ids = comp[ids[:, ::-1]]
    lo = np.asarray(model.apply(params, ids))
    lr = np.asarray(model.apply(params, rc_ids))
    np.testing.assert_allclose(lo, lr[:, ::-1][..., comp], atol=1e-4)
