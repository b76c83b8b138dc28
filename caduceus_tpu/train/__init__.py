from caduceus_tpu.train.optim import make_optimizer, cosine_warmup_schedule
from caduceus_tpu.train.metrics import cross_entropy_loss, Perplexity

__all__ = [
    "make_optimizer",
    "cosine_warmup_schedule",
    "cross_entropy_loss",
    "Perplexity",
]
