"""Recurrent (O(1)-per-token) Mamba inference: step, cache, generation.

TPU-native equivalent of the reference's inference-cache path — mamba-ssm's
``Mamba.step`` / ``allocate_inference_cache`` (plumbed through
`caduceus/modeling_rcps.py:201-206`) and the generation entry point on
`src/models/sequence/long_conv_lm.py:391-493`.

The cache per layer is, for version=1 (selective scan):
  conv: (B, d_conv, d_inner)  — ring buffer of the last d_conv conv inputs
                                 (newest at index d_conv-1, matching
                                 ``ops/conv.py`` tap layout w[K-1] = current)
  ssm:  (B, d_inner, d_state) — the recurrence state, kept in fp32 (the
                                 reference CUDA kernel reads state fp32)
and for version=2 (Mamba-2 / SSD, `ops/ssd.py` — beyond the reference,
which pins mamba-ssm 1.2.0):
  conv: (B, d_conv, d_inner + 2·NG·N) — ring buffer over the pre-conv xBC
  ssm:  (B, H, N, P) fp32            — per-head state (``ssd_step`` layout)

Generation is defined for causal models only (``bidirectional=False``,
``rcps=False``) — the reference likewise only generates through the
unidirectional ``MambaLMHeadModel``/``ConvLMHeadModel`` paths; bidirectional
MLM models have no autoregressive factorization. ``init_cache`` still
allocates per-direction caches for bidirectional layers so streaming
(chunked prefill) use is possible for the forward direction.

All functions are pure and jit/scan-friendly: params are the pytree from
``model.init`` and caches are explicit inputs/outputs.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from caduceus_tpu.config import CaduceusConfig
from caduceus_tpu.ops.norms import add_norm, layer_norm, rms_norm

Cache = Dict[str, Any]


def _unwrap(params: Dict[str, Any]) -> Dict[str, Any]:
    return params["params"] if "params" in params else params


def init_cache(cfg: CaduceusConfig, batch_size: int) -> Cache:
    """Allocate the zeroed inference cache (the reference's
    ``allocate_inference_cache``, mamba-ssm ``Mamba.allocate_inference_cache``).
    """
    s = cfg.ssm_cfg
    d_inner = cfg.d_inner
    dirs = ["fwd", "rev"] if cfg.bidirectional else ["fwd"]
    if s.version == 2:
        d_conv_dim = d_inner + 2 * s.ngroups * s.d_state
        ssm_shape = (batch_size, cfg.nheads, s.d_state, s.headdim)
    else:
        d_conv_dim = d_inner
        ssm_shape = (batch_size, d_inner, s.d_state)
    layer = {
        d: {
            "conv": jnp.zeros(
                (batch_size, s.d_conv, d_conv_dim), jnp.dtype(cfg.dtype)
            ),
            "ssm": jnp.zeros(ssm_shape, jnp.float32),
        }
        for d in dirs
    }
    return {f"layers_{i}": jax.tree.map(jnp.copy, layer) for i in range(cfg.n_layer)}


def mamba_direction_step(
    dparams: Dict[str, Any],
    cfg: CaduceusConfig,
    xi_t: jnp.ndarray,  # (B, d_inner) — post in_proj, pre conv
    cache: Cache,
) -> Tuple[jnp.ndarray, Cache]:
    """One step of the inner SSM branch (conv → projections → state update).

    Matches ``ops/selective_scan.py`` / the Pallas kernel step-for-step:
    h = exp(Δ·A)·h + Δ·u·B ; y = C·h + D·u (mamba-ssm ``Mamba.step``).
    """
    s = cfg.ssm_cfg
    conv_w = dparams["conv_w"].astype(xi_t.dtype)  # (K, d_inner)
    conv = jnp.concatenate([cache["conv"][:, 1:], xi_t[:, None, :]], axis=1)
    xc = jnp.sum(conv * conv_w[None], axis=1)
    if "conv_b" in dparams:
        xc = xc + dparams["conv_b"].astype(xc.dtype)
    xc = jax.nn.silu(xc)

    dbc = xc @ dparams["x_proj_w"].astype(xc.dtype)  # (B, dt_rank + 2N)
    dt, Bv, Cv = jnp.split(
        dbc, [cfg.dt_rank, cfg.dt_rank + s.d_state], axis=-1
    )
    delta = dt @ dparams["dt_proj_w"].astype(dt.dtype)  # (B, d_inner)
    delta = jax.nn.softplus(
        delta.astype(jnp.float32) + dparams["dt_proj_b"].astype(jnp.float32)
    )

    A = -jnp.exp(dparams["A_log"].astype(jnp.float32))  # (d_inner, N)
    dA = jnp.exp(delta[..., None] * A[None])            # (B, d_inner, N)
    xf = xc.astype(jnp.float32)
    drive = (delta * xf)[..., None] * Bv.astype(jnp.float32)[:, None, :]
    ssm = cache["ssm"] * dA + drive
    y = jnp.sum(ssm * Cv.astype(jnp.float32)[:, None, :], axis=-1)
    y = y + dparams["D"].astype(jnp.float32) * xf
    return y.astype(xi_t.dtype), {"conv": conv, "ssm": ssm}


def mamba2_direction_step(
    dparams: Dict[str, Any],
    cfg: CaduceusConfig,
    xBC_t: jnp.ndarray,  # (B, d_inner + 2·NG·N) — pre-conv
    dt_t: jnp.ndarray,  # (B, H) — raw dt channel of in_proj
    cache: Cache,
) -> Tuple[jnp.ndarray, Cache]:
    """One step of the v2 (SSD) inner branch: conv → x/B/C split → ssd_step.

    Matches ``ops/ssd.py`` ``_conv_silu_chunk`` + the scan step-for-step
    (fp32 conv accumulation, fp32 state; mamba-ssm 2.x ``Mamba2.step``).
    """
    s = cfg.ssm_cfg
    H, P, NG, N = cfg.nheads, s.headdim, s.ngroups, s.d_state
    B = xBC_t.shape[0]
    conv_w = dparams["conv_w"].astype(xBC_t.dtype)  # (K, d_conv_dim)
    conv = jnp.concatenate([cache["conv"][:, 1:], xBC_t[:, None, :]], axis=1)
    xc = jnp.sum(
        conv.astype(jnp.float32) * conv_w.astype(jnp.float32)[None], axis=1
    )
    if "conv_b" in dparams:
        xc = xc + dparams["conv_b"].astype(jnp.float32)
    xc = jax.nn.silu(xc)  # (B, d_conv_dim) fp32

    x_t = xc[:, : H * P].reshape(B, H, P)
    B_t = xc[:, H * P: H * P + NG * N].reshape(B, NG, N)
    C_t = xc[:, H * P + NG * N:].reshape(B, NG, N)

    from caduceus_tpu.ops.ssd import ssd_step

    ssm, y = ssd_step(
        cache["ssm"], x_t, dt_t.astype(jnp.float32),
        -jnp.exp(dparams["A_log"].astype(jnp.float32)), B_t, C_t,
        D=dparams["D"], dt_bias=dparams["dt_bias"], dt_softplus=True,
    )
    return y.reshape(B, cfg.d_inner).astype(xBC_t.dtype), {
        "conv": conv.astype(cache["conv"].dtype), "ssm": ssm
    }


def mamba2_step(
    mparams: Dict[str, Any],
    cfg: CaduceusConfig,
    x_t: jnp.ndarray,  # (B, d_model)
    cache: Cache,
) -> Tuple[jnp.ndarray, Cache]:
    """One v2 (Mamba-2) mixer step: in_proj → conv/SSD step → gated norm →
    out_proj (``models/mamba2.py`` ``Mamba2Mixer`` column-for-column)."""
    from caduceus_tpu.models.mamba2 import rms_norm_gated

    sub = mparams["mamba_fwd"]
    s = cfg.ssm_cfg
    zxbcdt = x_t @ sub["in_proj"]["kernel"].astype(x_t.dtype)
    if "bias" in sub["in_proj"]:
        zxbcdt = zxbcdt + sub["in_proj"]["bias"].astype(zxbcdt.dtype)
    d_xbc = cfg.d_inner + 2 * s.ngroups * s.d_state
    z, xBC_t, dt_t = jnp.split(
        zxbcdt, [cfg.d_inner, cfg.d_inner + d_xbc], axis=-1
    )
    y, new_fwd = mamba2_direction_step(sub["fwd"], cfg, xBC_t, dt_t, cache["fwd"])
    y = rms_norm_gated(y, z, sub["norm_w"], s.ngroups, cfg.norm_epsilon)
    out = y @ sub["out_proj"]["kernel"].astype(y.dtype)
    if "bias" in sub["out_proj"]:
        out = out + sub["out_proj"]["bias"].astype(out.dtype)
    return out, {"fwd": new_fwd}


def bimamba_step(
    mparams: Dict[str, Any],
    cfg: CaduceusConfig,
    x_t: jnp.ndarray,  # (B, d_model)
    cache: Cache,
) -> Tuple[jnp.ndarray, Cache]:
    """One mixer step. Causal models only (the reverse direction of a
    bidirectional layer is anticausal — no stepwise form exists)."""
    if cfg.bidirectional:
        raise NotImplementedError(
            "stepwise decoding requires bidirectional=False (the reference "
            "generates only through unidirectional backbones, "
            "`src/models/sequence/long_conv_lm.py:391-493`)"
        )
    if cfg.ssm_cfg.version == 2:
        return mamba2_step(mparams, cfg, x_t, cache)
    sub = mparams["mamba_fwd"]
    xz = x_t @ sub["in_proj"]["kernel"].astype(x_t.dtype)
    if "bias" in sub["in_proj"]:
        xz = xz + sub["in_proj"]["bias"].astype(xz.dtype)
    xi, z = jnp.split(xz, 2, axis=-1)
    y, new_fwd = mamba_direction_step(sub["fwd"], cfg, xi, cache["fwd"])
    y = y * jax.nn.silu(z)
    out = y @ sub["out_proj"]["kernel"].astype(y.dtype)
    if "bias" in sub["out_proj"]:
        out = out + sub["out_proj"]["bias"].astype(out.dtype)
    return out, {"fwd": new_fwd}


def block_step(
    lparams: Dict[str, Any],
    cfg: CaduceusConfig,
    x_t: jnp.ndarray,
    residual: Optional[jnp.ndarray],
    cache: Cache,
) -> Tuple[jnp.ndarray, jnp.ndarray, Cache]:
    """One CaduceusBlock step: (add → norm) → mixer, same contract as
    ``models/caduceus.py`` CaduceusBlock."""
    normed, residual = add_norm(
        x_t,
        lparams["norm_w"],
        lparams.get("norm_b"),
        residual=residual,
        eps=cfg.norm_epsilon,
        use_rms=cfg.rms_norm,
        residual_in_fp32=cfg.residual_in_fp32,
        prenorm=True,
    )
    out, cache = bimamba_step(lparams["mixer"], cfg, normed, cache)
    return out, residual, cache


def lm_step(
    params: Dict[str, Any],
    cfg: CaduceusConfig,
    token_t: jnp.ndarray,  # (B,) int ids
    caches: Cache,
    tie_word_embeddings: bool = True,
) -> Tuple[jnp.ndarray, Cache]:
    """One full-model step: token → next-token logits (fp32), updated caches.

    Numerically equals column t of ``CaduceusForMaskedLM.__call__`` on the
    full sequence (verified by tests/test_inference.py).
    """
    p = _unwrap(params)
    bb = p["backbone"]
    dtype = jnp.dtype(cfg.dtype)
    h = bb["embedding"].astype(dtype)[token_t]  # (B, d_model)

    residual = None
    new_caches = {}
    for i in range(cfg.n_layer):
        key = f"layers_{i}"
        h, residual, new_caches[key] = block_step(
            bb[key], cfg, h, residual, caches[key]
        )

    final = h if residual is None else residual + h.astype(residual.dtype)
    if cfg.residual_in_fp32:
        final = final.astype(jnp.float32)
    if cfg.rms_norm:
        h = rms_norm(final, bb["norm_f_w"], eps=cfg.norm_epsilon).astype(dtype)
    else:
        h = layer_norm(
            final, bb["norm_f_w"], bb.get("norm_f_b"), eps=cfg.norm_epsilon
        ).astype(dtype)

    W = (bb["embedding"] if tie_word_embeddings else p["lm_head"]).astype(dtype)
    logits = h @ W.T
    return logits.astype(jnp.float32), new_caches


def _resolved_infer_kernel(cfg: CaduceusConfig) -> str:
    """Mirror the model's kernel auto-resolution (`models/mamba2.py` /
    `models/mamba.py`): v2 auto resolves to the head-batched kernels on
    TPU, v1 to the base Pallas kernels."""
    k = cfg.ssm_cfg.use_kernel
    if k == "auto":
        if jax.default_backend() == "cpu":
            return "xla"
        return "pallas_batched" if cfg.ssm_cfg.version == 2 else "pallas"
    return k


def _conv_with_history(xi: jnp.ndarray, cache_conv: jnp.ndarray):
    """Prepend the cached K-1 pre-conv columns so the parallel conv
    continues the stepwise ring buffer exactly. Returns (extended input
    whose conv outputs from index K-1 equal the continuation, new ring
    buffer = last K columns)."""
    K = cache_conv.shape[1]
    hist = cache_conv[:, 1:].astype(xi.dtype)  # rows 1..K-1 = last K-1 inputs
    xi_ext = jnp.concatenate([hist, xi], axis=1)
    new_conv = xi_ext[:, -K:]
    return xi_ext, new_conv


def mamba_direction_prefill(
    dparams: Dict[str, Any],
    cfg: CaduceusConfig,
    xi: jnp.ndarray,  # (B, Lp, d_inner) — post in_proj, pre conv
    cache: Cache,
    use_kernel: str,
) -> Tuple[jnp.ndarray, Cache]:
    """Parallel-prompt pass of the v1 inner branch: full-sequence conv +
    chained selective scan seeded from / emitting the stepwise cache
    (VERDICT r2 #5 — the reference processes prompts with the parallel
    kernel before stepping, mamba-ssm generation /
    `src/models/sequence/long_conv_lm.py:391-493`)."""
    from caduceus_tpu.ops.conv import causal_conv1d

    s = cfg.ssm_cfg
    K = s.d_conv
    xi_ext, new_conv = _conv_with_history(xi, cache["conv"])
    xc = causal_conv1d(
        xi_ext, dparams["conv_w"].astype(xi.dtype),
        dparams.get("conv_b"), activation="silu",
    )[:, K - 1:]

    dbc = xc @ dparams["x_proj_w"].astype(xc.dtype)
    dt, B_mat, C = jnp.split(
        dbc, [cfg.dt_rank, cfg.dt_rank + s.d_state], axis=-1
    )
    delta_raw = dt @ dparams["dt_proj_w"].astype(dt.dtype)
    A = -jnp.exp(dparams["A_log"].astype(jnp.float32))
    h0 = cache["ssm"]  # (B, d_inner, N) fp32

    if use_kernel.startswith("pallas"):
        from caduceus_tpu.ops.scan_pallas import selective_scan_pallas_chained

        y, hN = selective_scan_pallas_chained(
            xc, delta_raw, A, B_mat, C, dparams["D"], dparams["dt_proj_b"],
            jnp.transpose(h0, (0, 2, 1)),  # kernel h layout (G, N, d)
            delta_softplus=True,
            interpret=use_kernel == "pallas_interpret",
        )
        hN = jnp.transpose(hN, (0, 2, 1))
    else:
        y, hN = selective_scan_xla_chained(
            xc, delta_raw, A, B_mat, C, dparams["D"], dparams["dt_proj_b"],
            h0,
        )
    return y, {"conv": new_conv.astype(cache["conv"].dtype), "ssm": hN}


def selective_scan_xla_chained(u, delta, A, B_mat, C, D, dt_bias, h0):
    from caduceus_tpu.ops.selective_scan import selective_scan

    return selective_scan(
        u, delta, A, B_mat, C, D=D, delta_bias=dt_bias, delta_softplus=True,
        h_init=h0, return_final_state=True,
    )


def mamba2_direction_prefill(
    dparams: Dict[str, Any],
    cfg: CaduceusConfig,
    xBC: jnp.ndarray,  # (B, Lp, d_inner + 2·NG·N) — pre-conv
    dt: jnp.ndarray,  # (B, Lp, H) — raw dt channel
    cache: Cache,
    use_kernel: str,
) -> Tuple[jnp.ndarray, Cache]:
    """Parallel-prompt pass of the v2 (SSD) inner branch via the chained
    chunked scan (`ops/ssd.py` / `ops/ssd_pallas.py`)."""
    from caduceus_tpu.ops.conv import causal_conv1d

    s = cfg.ssm_cfg
    H, P, NG, N = cfg.nheads, s.headdim, s.ngroups, s.d_state
    B, Lp = xBC.shape[:2]
    K = s.d_conv
    xBC_ext, new_conv = _conv_with_history(xBC, cache["conv"])
    xc = causal_conv1d(
        xBC_ext, dparams["conv_w"].astype(xBC.dtype),
        dparams.get("conv_b"), activation="silu",
    )[:, K - 1:]
    x4 = xc[..., : H * P].reshape(B, Lp, H, P)
    B4 = xc[..., H * P: H * P + NG * N].reshape(B, Lp, NG, N)
    C4 = xc[..., H * P + NG * N:].reshape(B, Lp, NG, N)
    A = -jnp.exp(dparams["A_log"].astype(jnp.float32))
    h0 = cache["ssm"]  # (B, H, N, P) fp32

    if use_kernel.startswith("pallas"):
        from caduceus_tpu.ops.ssd_pallas import resolve_ssd_kernel

        _, chained_fn, interp = resolve_ssd_kernel(use_kernel)
        y, hN = chained_fn(
            x4, dt, A, B4, C4, dparams["D"], dparams["dt_bias"], h0,
            dt_softplus=True, chunk_size=s.ssd_chunk_size,
            interpret=interp,
            seg_chunks=s.ssd_seg_chunks,
        )
    else:
        from caduceus_tpu.ops.ssd import ssd_chunked

        y, hN = ssd_chunked(
            x4, dt, A, B4, C4, D=dparams["D"], dt_bias=dparams["dt_bias"],
            dt_softplus=True, chunk_size=s.ssd_chunk_size, h_init=h0,
            return_final_state=True, seg_chunks=s.ssd_seg_chunks,
        )
    return y.reshape(B, Lp, cfg.d_inner), {
        "conv": new_conv.astype(cache["conv"].dtype), "ssm": hN
    }


def mixer_prefill(
    mparams: Dict[str, Any],
    cfg: CaduceusConfig,
    x: jnp.ndarray,  # (B, Lp, d_model)
    cache: Cache,
    use_kernel: str,
) -> Tuple[jnp.ndarray, Cache]:
    """Parallel-prompt pass of one causal mixer (v1 or v2)."""
    sub = mparams["mamba_fwd"]
    s = cfg.ssm_cfg
    xz = x @ sub["in_proj"]["kernel"].astype(x.dtype)
    if "bias" in sub["in_proj"]:
        xz = xz + sub["in_proj"]["bias"].astype(xz.dtype)
    if s.version == 2:
        from caduceus_tpu.models.mamba2 import rms_norm_gated

        d_xbc = cfg.d_inner + 2 * s.ngroups * s.d_state
        z, xBC, dt = jnp.split(
            xz, [cfg.d_inner, cfg.d_inner + d_xbc], axis=-1
        )
        y, new_fwd = mamba2_direction_prefill(
            sub["fwd"], cfg, xBC, dt, cache["fwd"], use_kernel)
        y = rms_norm_gated(y, z, sub["norm_w"], s.ngroups, cfg.norm_epsilon)
    else:
        xi, z = jnp.split(xz, 2, axis=-1)
        y, new_fwd = mamba_direction_prefill(
            sub["fwd"], cfg, xi, cache["fwd"], use_kernel)
        y = y.astype(x.dtype) * jax.nn.silu(z)
    out = y.astype(x.dtype) @ sub["out_proj"]["kernel"].astype(x.dtype)
    if "bias" in sub["out_proj"]:
        out = out + sub["out_proj"]["bias"].astype(out.dtype)
    return out, {"fwd": new_fwd}


def prefill(
    params: Dict[str, Any],
    cfg: CaduceusConfig,
    prompt_ids: jnp.ndarray,  # (B, Lp)
    caches: Optional[Cache] = None,
    mode: str = "parallel",
    tie_word_embeddings: bool = True,
) -> Tuple[jnp.ndarray, Cache]:
    """Process the prompt and return (last-position logits, caches).

    ``mode="parallel"`` (default) runs the prompt through the PARALLEL
    kernels — full-sequence conv + chained scan with ``h_init`` /
    ``return_final_state`` — one device dispatch per layer instead of O(Lp)
    sequential steps, exactly like the reference's generation path
    (mamba-ssm processes the prompt with the parallel kernel and only then
    steps). ``mode="stepwise"`` keeps the lax.scan-of-steps form (the
    numerics oracle; `tests/test_inference.py` asserts both agree).

    Chained calls (pass ``caches`` from a previous prefill) stream a long
    sequence through in chunks — the conv ring buffer and scan state carry
    across calls exactly.
    """
    if cfg.bidirectional or cfg.rcps:
        raise NotImplementedError(
            "prefill requires a causal config (bidirectional=False, "
            "rcps=False)"
        )
    B = prompt_ids.shape[0]
    if caches is None:
        caches = init_cache(cfg, B)

    if mode == "stepwise":
        def step(carry, tok):
            logits, carry = lm_step(params, cfg, tok, carry,
                                    tie_word_embeddings=tie_word_embeddings)
            return carry, logits

        caches, logits_all = jax.lax.scan(step, caches, prompt_ids.T)
        return logits_all[-1], caches

    use_kernel = _resolved_infer_kernel(cfg)
    p = _unwrap(params)
    bb = p["backbone"]
    dtype = jnp.dtype(cfg.dtype)
    h = bb["embedding"].astype(dtype)[prompt_ids]  # (B, Lp, d_model)

    residual = None
    new_caches = {}
    for i in range(cfg.n_layer):
        key = f"layers_{i}"
        lp = bb[key]
        normed, residual = add_norm(
            h, lp["norm_w"], lp.get("norm_b"), residual=residual,
            eps=cfg.norm_epsilon, use_rms=cfg.rms_norm,
            residual_in_fp32=cfg.residual_in_fp32, prenorm=True,
        )
        h, new_caches[key] = mixer_prefill(
            lp["mixer"], cfg, normed, caches[key], use_kernel)

    final = h if residual is None else residual + h.astype(residual.dtype)
    if cfg.residual_in_fp32:
        final = final.astype(jnp.float32)
    if cfg.rms_norm:
        hn = rms_norm(final, bb["norm_f_w"], eps=cfg.norm_epsilon).astype(dtype)
    else:
        hn = layer_norm(
            final, bb["norm_f_w"], bb.get("norm_f_b"), eps=cfg.norm_epsilon
        ).astype(dtype)
    W = (bb["embedding"] if tie_word_embeddings else p["lm_head"]).astype(dtype)
    logits = hn[:, -1] @ W.T
    return logits.astype(jnp.float32), new_caches


def generate(
    params: Dict[str, Any],
    cfg: CaduceusConfig,
    prompt_ids: jnp.ndarray,  # (B, Lp)
    max_new_tokens: int,
    rng: Optional[jax.Array] = None,
    temperature: float = 0.0,
    top_k: Optional[int] = None,
) -> jnp.ndarray:
    """Autoregressive generation with O(1) state per token.

    temperature == 0 → greedy; otherwise softmax sampling (optionally
    top-k-truncated). Returns (B, Lp + max_new_tokens) token ids.
    """
    if cfg.bidirectional or cfg.rcps:
        raise NotImplementedError(
            "generation requires a causal config (bidirectional=False, "
            "rcps=False)"
        )
    if rng is None:
        rng = jax.random.PRNGKey(0)
    last_logits, caches = prefill(params, cfg, prompt_ids)

    def sample(rng, logits):
        if temperature == 0.0:
            return jnp.argmax(logits, axis=-1).astype(prompt_ids.dtype)
        logits = logits / temperature
        if top_k is not None:
            kth = jnp.sort(logits, axis=-1)[..., -top_k][..., None]
            logits = jnp.where(logits < kth, -jnp.inf, logits)
        return jax.random.categorical(rng, logits).astype(prompt_ids.dtype)

    def step(carry, rng_t):
        caches, logits = carry
        tok = sample(rng_t, logits)
        logits, caches = lm_step(params, cfg, tok, caches)
        return (caches, logits), tok

    rngs = jax.random.split(rng, max_new_tokens)
    _, new_tokens = jax.lax.scan(step, (caches, last_logits), rngs)
    return jnp.concatenate([prompt_ids, new_tokens.T], axis=1)
