"""Adaptive embedding + projected adaptive log-softmax (Transformer-XL).

Parity with `src/models/nn/adaptive_softmax.py` (`ProjectedAdaptiveLogSoftmax`
`:37-298`, `AdaptiveEmbedding` `:300-393`) — used by the reference's
`AdaptiveLMTask` (`src/tasks/tasks.py:335-382`); no genomics config uses it,
implemented for capability completeness.

TPU-first formulation: the reference scatters per-cluster rows with
`index_put_`/`nonzero` (data-dependent shapes). Here every cluster computes
on the full flattened batch under a mask — static shapes, jit/pjit-friendly;
the log-probability matrix is assembled densely and targets are gathered,
which XLA fuses. Cluster c covers ids [cutoff_{c}, cutoff_{c+1}) with
embedding width d_embed / div_val**c and a d_proj projection.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _spans(n_token: int, cutoffs: Sequence[int]) -> Tuple[Tuple[int, int], ...]:
    ends = [0] + list(cutoffs) + [n_token]
    return tuple((ends[i], ends[i + 1]) for i in range(len(ends) - 1))


class AdaptiveEmbedding(nn.Module):
    """`AdaptiveEmbedding` (`adaptive_softmax.py:300-393`): per-cluster
    embedding tables of width d_embed/div_val**i, projected to d_proj and
    scaled by sqrt(d_proj)."""

    n_token: int
    d_embed: int
    d_proj: int
    cutoffs: Sequence[int] = ()
    div_val: int = 1
    init_scale: float = 1.0

    @nn.compact
    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        spans = _spans(self.n_token, self.cutoffs)
        out = jnp.zeros((*ids.shape, self.d_proj), jnp.float32)
        for i, (l, r) in enumerate(spans):
            d_emb_i = self.d_embed // (self.div_val ** i)
            table = self.param(
                f"emb_{i}",
                nn.initializers.normal(self.init_scale * d_emb_i ** -0.5),
                (r - l, d_emb_i), jnp.float32,
            )
            local = jnp.clip(ids - l, 0, r - l - 1)
            emb_i = table[local]
            if d_emb_i != self.d_proj:
                proj = self.param(
                    f"proj_{i}",
                    nn.initializers.normal(self.init_scale * 0.01),
                    (d_emb_i, self.d_proj), jnp.float32,
                )
                emb_i = emb_i @ proj
            mask = ((ids >= l) & (ids < r))[..., None]
            out = out + jnp.where(mask, emb_i, 0.0)
        return out * (self.d_proj ** 0.5)


class ProjectedAdaptiveLogSoftmax(nn.Module):
    """`ProjectedAdaptiveLogSoftmax` (`adaptive_softmax.py:37-298`): head
    cluster = shortlist + one logit per tail cluster; tail log-probs offset
    by their cluster's head log-prob."""

    n_token: int
    d_embed: int
    d_proj: int
    cutoffs: Sequence[int] = ()
    div_val: int = 1
    init_scale: float = 1.0

    def _cluster_logit(self, hidden, i, l, r):
        d_emb_i = self.d_embed // (self.div_val ** i)
        weight = self.param(
            f"out_{i}",
            nn.initializers.normal(self.init_scale * d_emb_i ** -0.5),
            (r - l, d_emb_i), jnp.float32,
        )
        bias = self.param(f"bias_{i}", nn.initializers.zeros, (r - l,),
                          jnp.float32)
        h = hidden
        if d_emb_i != self.d_proj:
            proj = self.param(
                f"out_proj_{i}",
                nn.initializers.normal(self.init_scale * 0.01),
                (self.d_proj, d_emb_i), jnp.float32,
            )
            h = h @ proj
        return h @ weight.T + bias

    @nn.compact
    def log_prob(self, hidden: jnp.ndarray) -> jnp.ndarray:
        """(..., d_proj) → (..., n_token) full log-probabilities."""
        spans = _spans(self.n_token, self.cutoffs)
        lead = hidden.shape[:-1]
        h = hidden.reshape(-1, self.d_proj).astype(jnp.float32)
        n_clusters = len(spans) - 1

        head = self._cluster_logit(h, 0, *spans[0])  # (N, shortlist)
        if n_clusters > 0:
            cluster_w = self.param(
                "cluster_weight",
                nn.initializers.normal(self.init_scale * self.d_embed ** -0.5),
                (n_clusters, self.d_embed), jnp.float32,
            )
            cluster_b = self.param("cluster_bias", nn.initializers.zeros,
                                   (n_clusters,), jnp.float32)
            hw = h
            if self.d_embed != self.d_proj:
                cproj = self.param(
                    "cluster_proj",
                    nn.initializers.normal(self.init_scale * 0.01),
                    (self.d_proj, self.d_embed), jnp.float32,
                )
                hw = h @ cproj
            head = jnp.concatenate([head, hw @ cluster_w.T + cluster_b],
                                   axis=-1)
        head_lp = jax.nn.log_softmax(head, axis=-1)

        parts = [head_lp[:, : spans[0][1]]]
        for i, (l, r) in enumerate(spans[1:], start=1):
            tail_lp = jax.nn.log_softmax(
                self._cluster_logit(h, i, l, r), axis=-1
            )
            parts.append(tail_lp + head_lp[:, spans[0][1] + i - 1][:, None])
        return jnp.concatenate(parts, axis=-1).reshape(*lead, self.n_token)

    def __call__(self, hidden: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        """Per-element negative log-likelihood (reference forward contract)."""
        lp = self.log_prob(hidden)
        return -jnp.take_along_axis(lp, target[..., None], axis=-1)[..., 0]
