"""Multi-head attention with a fused TPU flash-attention path.

The reference's hybrid Hyena models run their attention layers through the
flash-attn CUDA package (`MHA` at `src/models/sequence/long_conv_lm.py:42-90`,
pinned `flash-attn==2.5.6` in `caduceus_env.yml:48`). The TPU-native
equivalent is the Pallas TPU flash-attention kernel that ships with JAX
(`jax.experimental.pallas.ops.tpu.flash_attention`): online-softmax blocks
resident in VMEM, O(L) HBM footprint instead of the O(L^2) score matrix XLA
materializes, and a custom VJP so it is trainable.

Dispatch mirrors the repo-wide ``use_kernel`` convention
(`models/mamba.py:274-280`):

- ``"auto"``  — Pallas kernel on TPU when the shape qualifies, XLA otherwise.
- ``"pallas"`` — force the kernel (asserts shape eligibility).
- ``"xla"``   — `jax.nn.dot_product_attention` (CPU tests, odd shapes).

Shape eligibility: the kernel tiles the sequence axis in 128-row blocks, so
``L % 128 == 0`` is required; anything else (including tiny test lengths)
falls back to XLA. Numerics: the kernel computes the QK/AV matmuls on the
MXU (bf16-class rounding, ~1e-3 relative), verified against the XLA oracle
on device by ``scripts/verify_tpu.py``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_BLOCK = 128  # sequence tiling granularity of the TPU flash kernel


def _flash_eligible(L: int) -> bool:
    return L % _BLOCK == 0 and L >= _BLOCK


def resolve_attention_kernel(use_kernel: str, L: int) -> str:
    """Resolve 'auto' the same way the scan kernels do (backend-based)."""
    if use_kernel == "auto":
        if jax.default_backend() == "cpu" or not _flash_eligible(L):
            return "xla"
        return "pallas"
    if use_kernel == "pallas" and not _flash_eligible(L):
        raise ValueError(
            f"flash attention needs seq_len % {_BLOCK} == 0, got L={L}; "
            "use use_kernel='xla' or pad the sequence")
    return use_kernel


def mha_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = True,
    sm_scale: Optional[float] = None,
    use_kernel: str = "auto",
) -> jnp.ndarray:
    """Scaled dot-product attention over (B, L, H, hd) tensors.

    Returns (B, L, H, hd). ``sm_scale`` defaults to 1/sqrt(hd), matching
    both `jax.nn.dot_product_attention` and the reference flash-attn MHA.
    """
    B, L, H, hd = q.shape
    if sm_scale is None:
        sm_scale = float(hd) ** -0.5
    kernel = resolve_attention_kernel(use_kernel, L)
    if kernel == "pallas":
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention)
        # kernel layout is (B, H, L, hd)
        bhld = lambda t: t.transpose(0, 2, 1, 3)
        out = flash_attention(bhld(q), bhld(k), bhld(v),
                              causal=causal, sm_scale=sm_scale)
        return out.transpose(0, 2, 1, 3)
    return jax.nn.dot_product_attention(q, k, v, scale=sm_scale,
                                        is_causal=causal)
