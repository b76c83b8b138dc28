"""Synthetic genome generator for tests and benchmarks.

Produces a random FASTA + BED pair with the same window contract as the
hg38 assets the reference trains on (BED rows spanning 2^20-base intervals
tagged with train/valid/test splits).
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

from caduceus_tpu.data.fasta import write_fasta


def make_synthetic_genome(
    out_dir: str,
    n_chromosomes: int = 2,
    chrom_len: int = 1 << 16,
    window: int = 1 << 14,
    seed: int = 0,
    n_frac: float = 0.01,
) -> Tuple[str, str]:
    """Write `genome.fa` + `intervals.bed`; returns (fasta_path, bed_path).

    `window` plays the role of MAX_ALLOWED_LENGTH (2^20 in production); use a
    smaller power of two for fast tests.
    """
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    alphabet = np.frombuffer(b"ACGTN", np.uint8)
    probs = np.array([0.25, 0.25, 0.25, 0.25, 0.0])
    probs = probs * (1 - n_frac)
    probs[4] = n_frac
    contigs = {}
    bed_rows = []
    splits = ["train", "train", "train", "valid", "test"]
    for c in range(n_chromosomes):
        name = f"chr{c + 1}"
        seq = alphabet[rng.choice(5, size=chrom_len, p=probs)].tobytes().decode()
        contigs[name] = seq
        for w, start in enumerate(range(0, chrom_len - window + 1, window)):
            bed_rows.append((name, start, start + window, splits[(c * 7 + w) % len(splits)]))
    fasta_path = os.path.join(out_dir, "genome.fa")
    bed_path = os.path.join(out_dir, "intervals.bed")
    write_fasta(fasta_path, contigs)
    with open(bed_path, "w") as f:
        for chr_name, s, e, split in bed_rows:
            f.write(f"{chr_name}\t{s}\t{e}\t{split}\n")
    return fasta_path, bed_path
