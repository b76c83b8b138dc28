"""GenomicsBenchmark CNN baseline.

Parity with `src/models/baseline/genomics_benchmark_cnn.py:10-54` (itself
from the genomic_benchmarks repo): embed(100) → 3× [valid Conv1d + BatchNorm
(+ReLU on the first) + MaxPool(2)] → flatten → Linear(512) → Linear(classes).

JAX notes: channels-last layout; BatchNorm uses running statistics via flax
(`use_running_average` at eval).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class GenomicsBenchmarkCNN(nn.Module):
    num_classes: int
    vocab_size: int = 12
    embedding_dim: int = 100

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Embed(self.vocab_size, self.embedding_dim, name="embeddings")(input_ids)
        # (B, L, C); torch Conv1d valid padding == flax "VALID"
        spec = [(16, True), (8, False), (4, False)]  # (out_ch, relu)
        for i, (ch, relu) in enumerate(spec):
            x = nn.Conv(ch, kernel_size=(8,), padding="VALID", name=f"conv_{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, name=f"bn_{i}")(x)
            if relu:
                x = nn.relu(x)
            x = nn.max_pool(x, window_shape=(2,), strides=(2,))
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(512, name="fc1")(x)
        x = nn.Dense(self.num_classes, name="fc2")(x)
        return x.astype(jnp.float32)
