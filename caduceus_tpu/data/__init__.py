from caduceus_tpu.data.fasta import FastaFile
from caduceus_tpu.data.hg38 import HG38Dataset, HG38DataModule
from caduceus_tpu.data.mlm import mlm_mask
from caduceus_tpu.data.sampler import ShardedShuffleSampler

__all__ = [
    "FastaFile",
    "HG38Dataset",
    "HG38DataModule",
    "mlm_mask",
    "ShardedShuffleSampler",
]
