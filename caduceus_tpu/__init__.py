"""caduceus_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework for
bidirectional, reverse-complement-equivariant long-range DNA sequence modeling.

Re-designed from scratch with the capabilities of the Caduceus reference
(kuleshov-group/caduceus; Schiff et al. 2024, arXiv:2403.03234), built
TPU-first:

- the Mamba selective scan is a chunked associative scan (XLA baseline +
  Pallas kernel) instead of the reference's CUDA ``selective_scan_fn``;
- RCPS (reverse-complement parameter sharing) is a *parameterization*:
  both strands are carried in canonical orientation on a leading axis and
  processed by one set of shared weights, so the reference's per-layer
  flips (`modeling_rcps.py:85-99`) vanish entirely;
- BiMamba's forward/reverse passes share one input projection and, with the
  "add" combine and tied projections, one output projection
  (cf. `caduceus/modeling_caduceus.py:87-140`);
- distributed training is a pjit-sharded step over a `jax.sharding.Mesh`
  (data/model axes), not NCCL DDP.
"""

__version__ = "0.1.0"

from caduceus_tpu.config import (
    CaduceusConfig,
    SSMConfig,
)
from caduceus_tpu.tokenization import CaduceusTokenizer

__all__ = [
    "CaduceusConfig",
    "SSMConfig",
    "CaduceusTokenizer",
]
