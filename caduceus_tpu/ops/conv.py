"""Short causal depthwise convolution (the Mamba conv prologue).

Equivalent of the reference's ``causal_conv1d`` CUDA package
(`causal-conv1d==1.2.0.post2`, consumed transitively through `Mamba` with
``d_conv: 4`` / ``conv_bias: true`` — `configs/model/caduceus.yaml:11,19`).

On TPU this is expressed as a sum of shifted scaled copies — for kernel
width 4 that is 4 fused multiply-adds on the VPU, which XLA fuses with the
surrounding elementwise ops; a full `conv_general_dilated` would tile a
grouped conv onto the MXU for no benefit at width 4.

Layout: (B, L, d) with channels last.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def causal_conv1d(
    x: jnp.ndarray,  # (B, L, d) — or any (..., L, d)
    weight: jnp.ndarray,  # (K, d) — tap k multiplies x shifted by (K-1-k)
    bias: Optional[jnp.ndarray] = None,  # (d,)
    activation: Optional[str] = "silu",
    reverse: bool = False,
) -> jnp.ndarray:
    """Causal depthwise conv: y[t] = sum_k w[k] * x[t - (K-1-k)] (+ bias).

    ``weight[K-1]`` is the tap on the current timestep, matching torch
    ``Conv1d(groups=d, padding=K-1)`` weight layout ``(d, 1, K)`` transposed
    to ``(K, d)``.

    With ``reverse=True``, computes ``flip(causal_conv(flip(x)))`` without
    materializing the flips: tap k reads x shifted *left* (anti-causal).
    This is how the reverse direction of BiMamba
    (`caduceus/modeling_caduceus.py:128-133`) avoids data movement.
    """
    K = weight.shape[0]
    seq_axis = x.ndim - 2
    acc = x * weight[K - 1]
    for k in range(K - 1):
        shift = K - 1 - k
        # x shifted by `shift` along L with zero padding (right shift for
        # causal, left shift for the reverse/anti-causal direction).
        pad = [(0, 0)] * x.ndim
        pad[seq_axis] = (0, shift) if reverse else (shift, 0)
        start = shift if reverse else 0
        shifted = jnp.pad(x, pad)[
            tuple(
                slice(start, start + x.shape[i]) if i == seq_axis else slice(None)
                for i in range(x.ndim)
            )
        ]
        acc = acc + shifted * weight[k]
    if bias is not None:
        acc = acc + bias
    if activation == "silu":
        acc = jax.nn.silu(acc)
    elif activation is not None:
        raise NotImplementedError(activation)
    return acc
