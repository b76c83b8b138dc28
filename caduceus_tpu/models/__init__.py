from caduceus_tpu.models.caduceus import (
    Caduceus,
    CaduceusForMaskedLM,
    CaduceusForSequenceClassification,
)
from caduceus_tpu.models.mamba import BiMamba, MambaMixer

__all__ = [
    "Caduceus",
    "CaduceusForMaskedLM",
    "CaduceusForSequenceClassification",
    "BiMamba",
    "MambaMixer",
]
