from caduceus_tpu.ops.selective_scan import (
    selective_scan,
    selective_scan_ref,
)
from caduceus_tpu.ops.conv import causal_conv1d
from caduceus_tpu.ops.norms import rms_norm, layer_norm, add_norm

__all__ = [
    "selective_scan",
    "selective_scan_ref",
    "causal_conv1d",
    "rms_norm",
    "layer_norm",
    "add_norm",
]
