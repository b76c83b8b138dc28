"""Sequence decoders (task heads).

Parity with `src/tasks/decoders.py` `SequenceDecoder` (`:40-161`):
- restrict modes: last / first / pool (mean) / sum / ragged (`:86-127`),
  with optional per-example lengths for masked variants;
- conjoin handling (`:146-153`): a (..., d, 2) input applies the shared
  output projection to both strand channels and averages. Whether strands
  arrive stacked is decided by the data/model layer (the reference's
  `conjoin_train` / `conjoin_test`-at-eval distinction), so the head
  dispatches on input rank;
- left- or right-padded batches (the downstream CharacterTokenizer pads
  left by default, `tokenization.py`).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


def restrict_sequence(
    x: jnp.ndarray,  # (B, L, d)
    mode: str = "pool",
    lengths: Optional[jnp.ndarray] = None,  # (B,) valid lengths
    padding_side: str = "right",
) -> jnp.ndarray:
    """Reduce the length dimension per the reference's modes."""
    B, L, d = x.shape
    if lengths is not None:
        pos = jnp.arange(L)[None, :, None]
        if padding_side == "left":
            mask = pos >= (L - lengths[:, None, None])
        else:
            mask = pos < lengths[:, None, None]
    else:
        mask = None

    if mode == "last":
        if lengths is None or padding_side == "left":
            return x[:, -1]
        idx = jnp.clip(lengths - 1, 0, L - 1)
        return jnp.take_along_axis(x, idx[:, None, None].repeat(d, -1), axis=1)[:, 0]
    if mode == "first":
        if lengths is None or padding_side == "right":
            return x[:, 0]
        idx = jnp.clip(L - lengths, 0, L - 1)
        return jnp.take_along_axis(x, idx[:, None, None].repeat(d, -1), axis=1)[:, 0]
    if mode == "sum":
        return jnp.sum(x * mask, axis=1) if mask is not None else jnp.sum(x, axis=1)
    if mode in ("pool", "mean", "ragged"):
        # "ragged" is the length-aware mean (`decoders.py:111-127`)
        if mask is not None:
            denom = jnp.maximum(lengths, 1)[:, None]
            return jnp.sum(x * mask, axis=1) / denom
        return jnp.mean(x, axis=1)
    if mode == "max":
        return jnp.max(x, axis=1)
    raise NotImplementedError(f"restrict mode {mode!r}")


class SequenceDecoder(nn.Module):
    """Linear head over a restricted sequence representation, with conjoin
    strand averaging (shared weights, `decoders.py:146-153`)."""

    d_output: int
    mode: str = "pool"
    use_lengths: bool = False
    padding_side: str = "right"

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: Optional[jnp.ndarray] = None):
        from caduceus_tpu.models.mamba import torch_linear_init

        # torch nn.Linear default init (the reference decoder's
        # `self.output_transform = nn.Linear(...)`)
        fan_in = x.shape[-2] if x.ndim == 4 else x.shape[-1]
        head = nn.Dense(self.d_output, kernel_init=torch_linear_init(fan_in),
                        bias_init=torch_linear_init(fan_in),
                        name="output_transform")
        if x.ndim == 4:  # (B, L, d, 2) conjoined strands
            # both channels share the padding side: the data layer RCs the
            # RAW sequence before tokenize/pad (classification.py `get`,
            # reference `genomic_bench_dataset.py:104-118`)
            pooled_f = restrict_sequence(x[..., 0], self.mode, lengths,
                                         self.padding_side)
            pooled_r = restrict_sequence(x[..., 1], self.mode, lengths,
                                         self.padding_side)
            return (head(pooled_f) + head(pooled_r)) / 2
        pooled = restrict_sequence(x, self.mode, lengths, self.padding_side)
        return head(pooled)
