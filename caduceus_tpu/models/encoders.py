"""Input encoders — the reference's encoder registry, TPU-native.

Reference: `src/tasks/encoders.py` — a registry of input transforms applied
between the dataset batch and the model backbone (`registry` at
`encoders.py:33-38`: stop/id/embedding/linear), with constructor arguments
auto-extracted from the dataset (`n_tokens`, `d_input`) and the model
(`d_model`) (`encoders.py:40-61`). Genomics configs use the identity path;
the embedding/linear encoders are the generic-sequence-task capability
(continuous features or alternate vocabularies feeding the backbone).

Design here: plain flax modules + an explicit factory instead of
string-keyed attribute sniffing — datasets expose `n_tokens`/`d_input`
explicitly at call sites. The encoder output feeds
`CaduceusBackbone(inputs_embeds=...)` / classification models, replacing
the internal token embedding.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp


class IdentityEncoder(nn.Module):
    """`id` / `stop` (reference `encoders.py:34-35`)."""

    def __call__(self, x):
        return x


class EmbeddingEncoder(nn.Module):
    """Token-id embedding (reference `nn.Embedding`, `encoders.py:36`).

    (B, L) int ids → (B, L, d_model).
    """

    n_tokens: int
    d_model: int
    init_std: float = 0.02

    @nn.compact
    def __call__(self, x):
        table = self.param(
            "embedding",
            nn.initializers.normal(stddev=self.init_std),
            (self.n_tokens, self.d_model),
            jnp.float32,
        )
        return table[x]


class LinearEncoder(nn.Module):
    """Continuous-feature projection (reference `nn.Linear`,
    `encoders.py:37`). (B, L, d_input) float → (B, L, d_model)."""

    d_input: int
    d_model: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        x = jnp.asarray(x, jnp.float32)
        return nn.Dense(self.d_model, use_bias=self.use_bias,
                        name="proj")(x)


class OneHotEncoder(nn.Module):
    """Token ids → one-hot floats (reference `OneHotEncoder`,
    `src/tasks/encoders.py` onehot row in `dataset_attrs`)."""

    n_tokens: int

    def __call__(self, x):
        return jnp.eye(self.n_tokens, dtype=jnp.float32)[x]


class SequentialEncoder(nn.Module):
    """Composition (reference `U.PassthroughSequential`,
    `src/models/nn/utils.py:92-125`) — encoders applied in order."""

    encoders: Sequence[nn.Module]

    def __call__(self, x):
        for enc in self.encoders:
            x = enc(x)
        return x


class OneHotLinearEncoder(nn.Module):
    """onehot → linear in one module (dense float path for token inputs)."""

    n_tokens: int
    d_model: int

    @nn.compact
    def __call__(self, x):
        oh = jnp.eye(self.n_tokens, dtype=jnp.float32)[x]
        return nn.Dense(self.d_model, name="proj")(oh)


def make_encoder(
    kind: str,
    d_model: Optional[int] = None,
    n_tokens: Optional[int] = None,
    d_input: Optional[int] = None,
    name: Optional[str] = None,
) -> nn.Module:
    """Factory mirroring the reference registry keys
    (`src/tasks/encoders.py:33-38` + attribute tables `:40-61`)."""
    kw = {} if name is None else {"name": name}
    if kind in ("id", "stop", "identity", None):
        return IdentityEncoder(**kw)
    if kind == "embedding":
        assert n_tokens is not None and d_model is not None
        return EmbeddingEncoder(n_tokens=n_tokens, d_model=d_model, **kw)
    if kind == "linear":
        assert d_input is not None and d_model is not None
        return LinearEncoder(d_input=d_input, d_model=d_model, **kw)
    if kind == "onehot":
        assert n_tokens is not None
        if d_model is None:
            return OneHotEncoder(n_tokens=n_tokens, **kw)
        # onehot → linear: dense float path for token inputs
        return OneHotLinearEncoder(n_tokens=n_tokens, d_model=d_model, **kw)
    raise KeyError(f"unknown encoder: {kind!r}")


# registry-style alias (reference `encoders.registry` keys)
get_encoder = make_encoder
