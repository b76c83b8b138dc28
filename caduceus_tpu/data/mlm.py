"""MLM masking — deterministic, vectorized.

Semantics of `src/dataloaders/utils/mlm.py:4-32` (HF-style 80/10/10):
- positions masked with prob p; unmasked targets set to PAD (loss ignored);
- of masked: 80% → [MASK], 10% → random vocab id, 10% → unchanged.

Unlike the reference (per-item torch RNG, unseeded wrt resume), masking here
is a pure function of an explicit ``np.random.Generator``, so the data
pipeline is exactly reproducible and checkpointable (the iterator owns the
seed schedule: seed = f(base_seed, epoch, index)).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from caduceus_tpu.tokenization import MASK_ID, PAD_ID


def mlm_mask(
    seq: np.ndarray,
    rng: np.random.Generator,
    mlm_probability: float = 0.15,
    vocab_size: int = 12,
    mask_token_id: int = MASK_ID,
    pad_token_id: int = PAD_ID,
    eligible_replacements: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (data, target) int32 arrays of seq.shape."""
    data = seq.astype(np.int32).copy()
    target = data.copy()
    shape = data.shape

    masked = rng.random(shape) < mlm_probability
    target[~masked] = pad_token_id

    replaced = (rng.random(shape) < 0.8) & masked
    data[replaced] = mask_token_id

    randomized = (rng.random(shape) < 0.5) & masked & ~replaced
    if eligible_replacements is not None:
        words = eligible_replacements[
            rng.integers(0, len(eligible_replacements), shape)
        ]
    else:
        # reference default: any id in the full vocab (`mlm.py:28`)
        words = rng.integers(0, vocab_size, shape)
    data[randomized] = words[randomized]
    return data, target
