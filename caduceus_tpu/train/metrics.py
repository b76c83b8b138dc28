"""Losses and metrics.

- masked cross-entropy with ignore_index (reference model-level loss,
  `caduceus/modeling_caduceus.py:279-294`, task loss
  `configs/experiment/hg38/hg38.yaml:8-11`: ignore_index = PAD = 4);
- streaming Perplexity = exp(Σ loss·count / Σ count) with sum-reduction
  across steps/hosts (`src/tasks/torchmetrics.py:24-73`);
- functional metric registry: accuracy, accuracy@k, mcc, f1
  (`src/tasks/metrics.py:316-356`).

All loss math in fp32 (logits are cast by the model).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def cross_entropy_loss(
    logits: jnp.ndarray,  # (..., V) fp32
    targets: jnp.ndarray,  # (...,) int
    ignore_index: int = 4,
    loss_weights: Optional[jnp.ndarray] = None,
):
    """Returns (mean_loss, aux) where aux has the streaming sums.

    `loss_weights` reproduces `weighted_cross_entropy`
    (`modeling_caduceus.py:286-294`): weights normalized to sum 1 over the
    batch with ignored positions zeroed.
    """
    logits = logits.astype(jnp.float32)
    V = logits.shape[-1]
    logits2 = logits.reshape(-1, V)
    tgt = targets.reshape(-1)
    mask = tgt != ignore_index
    safe_tgt = jnp.where(mask, tgt, 0)
    logz = jax.nn.logsumexp(logits2, axis=-1)
    ll = logz - jnp.take_along_axis(logits2, safe_tgt[:, None], axis=-1)[:, 0]
    if loss_weights is not None:
        w = loss_weights.reshape(-1) * mask
        w = w / jnp.maximum(w.sum(), 1e-8)
        loss = (ll * w).sum()
        count = mask.sum()
        return loss, {"loss_sum": loss * count, "count": count}
    loss_sum = (ll * mask).sum()
    count = mask.sum()
    mean = loss_sum / jnp.maximum(count, 1)
    return mean, {"loss_sum": loss_sum, "count": count}


def accuracy(logits: jnp.ndarray, targets: jnp.ndarray, ignore_index: Optional[int] = None):
    pred = jnp.argmax(logits, axis=-1).reshape(-1)
    tgt = targets.reshape(-1)
    if ignore_index is None:
        return (pred == tgt).mean()
    mask = tgt != ignore_index
    return ((pred == tgt) * mask).sum() / jnp.maximum(mask.sum(), 1)


def accuracy_at_k(logits: jnp.ndarray, targets: jnp.ndarray, k: int = 5):
    V = logits.shape[-1]
    l2 = logits.reshape(-1, V)
    tgt = targets.reshape(-1)
    topk = jax.lax.top_k(l2, k)[1]
    return (topk == tgt[:, None]).any(axis=-1).mean()


def last_k_ppl(logits: jnp.ndarray, targets: jnp.ndarray, k: int = 512,
               ignore_index: int = 4):
    """Perplexity over the last k positions of each sequence
    (`src/tasks/metrics.py:90-119` / HG38Task custom metric)."""
    loss, aux = cross_entropy_loss(
        logits[..., -k:, :], targets[..., -k:], ignore_index=ignore_index
    )
    return jnp.exp(loss), aux


def per_token_ppl(logits: jnp.ndarray, targets: jnp.ndarray,
                  ignore_index: int = 4):
    """Per-position NLL (host-side aggregation across batches gives the
    reference's per-token-ppl curves, `src/tasks/tasks.py:282-332`)."""
    logits = logits.astype(jnp.float32)
    V = logits.shape[-1]
    logz = jax.nn.logsumexp(logits, axis=-1)
    safe = jnp.where(targets == ignore_index, 0, targets)
    ll = logz - jnp.take_along_axis(logits, safe[..., None], axis=-1)[..., 0]
    mask = targets != ignore_index
    return ll * mask, mask


def per_class_accuracy(preds: np.ndarray, targets: np.ndarray,
                       num_classes: int) -> Dict[str, float]:
    """Per-class accuracy aggregated correctly across batches
    (`src/tasks/metrics.py:13-44` CorrectAggregatedMetric)."""
    preds = np.asarray(preds).ravel()
    targets = np.asarray(targets).ravel()
    out = {}
    for c in range(num_classes):
        m = targets == c
        out[f"acc_class_{c}"] = float((preds[m] == c).mean()) if m.any() else float("nan")
    return out


def roc_auc(scores: np.ndarray, targets: np.ndarray) -> float:
    from sklearn.metrics import roc_auc_score

    return float(roc_auc_score(np.asarray(targets).ravel(), np.asarray(scores).ravel()))


def mcc(preds: np.ndarray, targets: np.ndarray) -> float:
    """Matthews correlation (host-side, sklearn-compatible)."""
    from sklearn.metrics import matthews_corrcoef

    return float(matthews_corrcoef(np.asarray(targets).ravel(), np.asarray(preds).ravel()))


def f1(preds: np.ndarray, targets: np.ndarray, average: str = "binary") -> float:
    from sklearn.metrics import f1_score

    return float(f1_score(np.asarray(targets).ravel(), np.asarray(preds).ravel(), average=average))


@dataclass
class Perplexity:
    """Streaming perplexity: exp of count-weighted mean NLL
    (`src/tasks/torchmetrics.py:24-73`). Host-side accumulator fed by the
    jitted step's (loss_sum, count) aux outputs."""

    loss_sum: float = 0.0
    count: float = 0.0

    def update(self, loss_sum, count) -> None:
        self.loss_sum += float(loss_sum)
        self.count += float(count)

    def compute(self) -> float:
        if self.count == 0:
            return float("nan")
        return float(np.exp(self.loss_sum / self.count))

    def reset(self) -> None:
        self.loss_sum = 0.0
        self.count = 0.0


def _acc_ii(logits, targets):
    return accuracy(logits, targets, ignore_index=4)


# functional metric registry (parity with `src/tasks/metrics.py:316-355`)
output_metric_fns = {
    "accuracy": accuracy,
    "accuracy_ignore_index": _acc_ii,
    "accuracy@5": lambda l, t: accuracy_at_k(l, t, 5),
    "accuracy@10": lambda l, t: accuracy_at_k(l, t, 10),
    "last_k_ppl": last_k_ppl,
    "mcc": mcc,
    "f1_binary": lambda p, t: f1(p, t, "binary"),
    "f1_macro": lambda p, t: f1(p, t, "macro"),
    "f1_micro": lambda p, t: f1(p, t, "micro"),
    "roc_auc": roc_auc,
    "per_class_accuracy": per_class_accuracy,
}


@dataclass
class NumTokens:
    """Total non-ignored tokens seen (persists across epochs,
    `src/tasks/torchmetrics.py:75-115`)."""

    count: float = 0.0

    def update(self, count) -> None:
        self.count += float(count)

    def compute(self) -> float:
        return self.count
