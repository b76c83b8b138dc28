"""Normalization ops with the (normed, residual) dual-output contract.

The reference uses Triton fused add+(RMS)LayerNorm kernels
(`mamba_ssm.ops.triton.layernorm`, imported at
`caduceus/modeling_caduceus.py:21-27`). On TPU, XLA fuses the residual add
into the norm natively, so these are plain jnp compositions keeping the same
contract: ``add_norm(x, weight, residual=...) -> (normed, new_residual)``
with optional fp32 residual carry (`residual_in_fp32`,
`configs/model/caduceus.yaml:24`).

Statistics are always computed in fp32 regardless of input dtype (matching
the Triton kernels' internal fp32 accumulation).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.lax
import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """RMSNorm: x * rsqrt(mean(x^2) + eps) * weight, stats in fp32."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32)).astype(dtype)


def layer_norm(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """LayerNorm with fp32 statistics."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = normed * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dtype)


def add_norm(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    residual: Optional[jnp.ndarray] = None,
    eps: float = 1e-5,
    use_rms: bool = True,
    residual_in_fp32: bool = False,
    prenorm: bool = True,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Fused residual-add + norm, dual-output.

    Semantics of the Triton ``layer_norm_fn(..., prenorm=True)`` path used in
    `caduceus/modeling_rcps.py:174-197`: the new residual is ``x + residual``
    (carried in fp32 if `residual_in_fp32`), and the normed output is the
    norm of that sum, cast back to x.dtype.
    """
    if residual is None:
        new_residual = x
    else:
        new_residual = residual + x.astype(residual.dtype)
    if residual_in_fp32:
        new_residual = new_residual.astype(jnp.float32)
    if use_rms:
        normed = rms_norm(new_residual, weight, eps=eps).astype(x.dtype)
    else:
        normed = layer_norm(new_residual, weight, bias, eps=eps).astype(x.dtype)
    if prenorm:
        return normed, new_residual
    return normed, None
