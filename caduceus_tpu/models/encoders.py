"""Input encoders (reference `src/tasks/encoders.py`).

The genomics configs only ever use the identity encoder (token ids feed the
backbone's own embedding), but the reference keeps an encoder registry with
`embedding` and `linear` members for integer-/continuous-input tasks
(`encoders.py:62-88`); kept here for capability parity.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from caduceus_tpu.models.mamba import torch_linear_init


class IdentityEncoder(nn.Module):
    """`id` encoder (`encoders.py:84`): passthrough."""

    @nn.compact
    def __call__(self, x):
        return x


class EmbeddingEncoder(nn.Module):
    """`embedding` encoder: integer ids → d_model vectors
    (`encoders.py:64-72`, torch nn.Embedding init N(0,1))."""

    n_tokens: int
    d_model: int

    @nn.compact
    def __call__(self, x):
        table = self.param("embedding", nn.initializers.normal(1.0),
                           (self.n_tokens, self.d_model), jnp.float32)
        return table[x]


class LinearEncoder(nn.Module):
    """`linear` encoder: continuous features → d_model
    (`encoders.py:75-81`, torch nn.Linear defaults)."""

    d_input: int
    d_model: int

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            self.d_model,
            kernel_init=torch_linear_init(self.d_input),
            bias_init=torch_linear_init(self.d_input),
            name="linear",
        )(x)


def get_encoder(name: str, **kw) -> nn.Module:
    """Encoder registry (`encoders.py:84-88` dataset/model-attr matching is
    replaced by explicit kwargs)."""
    if name in (None, "id", "identity"):
        return IdentityEncoder()
    if name == "embedding":
        return EmbeddingEncoder(kw["n_tokens"], kw["d_model"])
    if name == "linear":
        return LinearEncoder(kw["d_input"], kw["d_model"])
    raise KeyError(f"unknown encoder {name!r} (have id, embedding, linear)")
