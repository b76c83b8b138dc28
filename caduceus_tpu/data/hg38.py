"""HG38 (human genome) MLM/NTP pretraining dataset + datamodule.

Parity with `src/dataloaders/datasets/hg38_dataset.py` and the `HG38`
datamodule (`src/dataloaders/genomics.py:29-205`):

- every BED interval is normalized to ``MAX_ALLOWED_LENGTH = 2**20`` bases
  and subdivided into ``2**20 / max_length`` shifted windows
  (`hg38_dataset.py:15,130-134,143-144`);
- interval boundary clamping shifts windows back inside the chromosome
  (`hg38_dataset.py:66-81`);
- N bases are replaced with PAD so they are ignored by the loss
  (`hg38_dataset.py:211-212`);
- targets: MLM (80/10/10) or next-token prediction (`hg38_dataset.py:214-227`);
- optional reverse-complement augmentation coin-flip (`hg38_dataset.py:86-87`).

TPU-first differences: windows land directly as token ids from the mmap'd
FASTA (no string round-trip); every random decision derives from
``(seed, epoch, index)`` so any batch is reproducible from the sampler
state alone (exactly-once resumable across hosts).
"""

from __future__ import annotations

import csv
from pathlib import Path
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

from caduceus_tpu.data.fasta import FastaFile
from caduceus_tpu.data.mlm import (
    mlm_mask_splitmix,
    splitmix_base,
    splitmix_draws,
    splitmix_u01,
)
from caduceus_tpu.data.sampler import ShardedShuffleSampler
from caduceus_tpu.tokenization import PAD_ID, SEP_ID, CaduceusTokenizer

MAX_ALLOWED_LENGTH = 2**20  # `hg38_dataset.py:15`


def read_bed(bed_file: str, split: str):
    """BED rows (chr, start, end, split) for one split; ends normalized to
    start + 2^20 (`hg38_dataset.py:140-144`)."""
    rows = []
    with open(bed_file) as f:
        for rec in csv.reader(f, delimiter="\t"):
            if not rec or rec[0].startswith("#"):
                continue
            chr_name, start = rec[0], int(rec[1])
            row_split = rec[3] if len(rec) > 3 else "train"
            if row_split == split:
                rows.append((chr_name, start, start + MAX_ALLOWED_LENGTH))
    return rows


class HG38Dataset:
    """Map-style dataset of (data, target) windows over a genome."""

    def __init__(
        self,
        split: str,
        bed_file: str,
        fasta_file: str,
        max_length: int,
        tokenizer: Optional[CaduceusTokenizer] = None,
        mlm: bool = True,
        mlm_probability: float = 0.15,
        add_eos: bool = False,
        rc_aug: bool = False,
        seed: int = 0,
        max_allowed_length: int = MAX_ALLOWED_LENGTH,
    ):
        if mlm and mlm_probability <= 0.0:
            raise ValueError("mlm_probability must be > 0 when mlm=True")
        self.split = split
        self.max_length = max_length
        self.mlm = mlm
        self.mlm_probability = mlm_probability
        self.add_eos = add_eos
        self.rc_aug = rc_aug
        self.seed = seed
        self.tokenizer = tokenizer or CaduceusTokenizer(model_max_length=max_length)
        self.max_allowed_length = max_allowed_length

        assert max_length <= max_allowed_length and max_allowed_length % max_length == 0, (
            "max_length must be a power-of-two divisor of the window size"
        )
        self.shifts = max_allowed_length // max_length

        self.rows = read_bed(bed_file, split)
        self.fasta = FastaFile(fasta_file)
        self._byte_table = self.tokenizer._byte_table
        self._complement = self.tokenizer.complement_array()
        self._n_id = self.tokenizer.get_vocab()["N"]

    def __len__(self) -> int:
        return len(self.rows) * self.shifts

    # -- window geometry (parity with FastaInterval, hg38_dataset.py:40-81) --
    def _window(self, row_idx: int, shift_idx: int) -> Tuple[str, int, int]:
        chr_name, start, end = self.rows[row_idx]
        L = self.max_length
        if L < self.max_allowed_length:
            start, end = start + shift_idx * L, start + (shift_idx + 1) * L
        chrom_len = self.fasta.length(chr_name)
        if end > chrom_len:
            start, end = start - (end - chrom_len), chrom_len
        if start < 0:
            start, end = 0, end - start
        if end > chrom_len:
            start, end = chrom_len - L, chrom_len
        return chr_name, start, end

    def get(self, idx: int, epoch: int = 0) -> Tuple[np.ndarray, np.ndarray]:
        row_idx, shift_idx = idx // self.shifts, idx % self.shifts
        chr_name, start, end = self._window(row_idx, shift_idx)
        ids = self.fasta.fetch_ids(chr_name, start, end, self._byte_table)

        # shared counter-based stream: batches are bit-identical between the
        # python and native loaders (mlm.py draw-layout contract)
        base = splitmix_base(self.seed, epoch, idx)
        if self.rc_aug and splitmix_u01(splitmix_draws(base, 0, 1))[0] < 0.5:
            ids = self._complement[ids[::-1]]

        # N → PAD so N positions are ignored by the loss
        ids = np.where(ids == self._n_id, PAD_ID, ids)

        if self.add_eos:
            ids = np.concatenate([ids, np.array([SEP_ID], np.int32)])

        if self.mlm:
            core = ids[:-1] if self.add_eos else ids
            return mlm_mask_splitmix(
                core,
                base,
                mlm_probability=self.mlm_probability,
                vocab_size=self.tokenizer.vocab_size,
            )
        data = ids[:-1].astype(np.int32)
        target = ids[1:].astype(np.int32)
        return data, target

    def __getitem__(self, idx: int):
        return self.get(idx, epoch=0)


class DataLoaderIterator:
    """Batched iterator over a dataset + sampler; resumable.

    state = sampler state; batches are host-local (global batch is
    ``batch_size * world_size``). With ``use_native=True`` the per-item work
    (FASTA extraction, tokenization, rc-aug, MLM) runs in the C++ worker
    pool (caduceus_tpu/data/native.py); both loaders draw from the same
    counter-based splitmix stream (mlm.py), so batches are bit-identical
    and a resumed run may switch loaders freely.
    """

    def __init__(self, dataset: HG38Dataset, sampler: ShardedShuffleSampler,
                 batch_size: int, drop_last: bool = True,
                 use_native: bool = False, n_threads: int = 8):
        self.dataset = dataset
        self.sampler = sampler
        self.batch_size = batch_size
        self.drop_last = drop_last
        self._native = None
        if use_native:
            from caduceus_tpu.data import native

            assert native.available(), (
                "native loader requested but native/libcaduceus_data.so is "
                "not built (scripts/build_native.sh)"
            )
            assert not (dataset.mlm and dataset.add_eos), (
                "native loader: MLM with add_eos is python-only"
            )
            nf = native.NativeFasta(dataset.fasta.path)
            n = len(dataset)
            geo = [dataset._window(i // dataset.shifts, i % dataset.shifts)
                   for i in range(n)]
            contigs = np.array([nf.index[c] for c, _, _ in geo], np.int32)
            starts = np.array([s for _, s, _ in geo], np.int64)
            ends = np.array([e for _, _, e in geo], np.int64)
            # targets/masking share the counter-based splitmix stream with
            # the python loader (mlm.py) — batches are bit-identical between
            # loaders, so resume may switch loaders mid-run.
            self._native = native.NativeHG38Loader(
                nf, contigs, starts, ends, seq_len=dataset.max_length,
                batch_size=batch_size, mlm=dataset.mlm,
                mlm_probability=dataset.mlm_probability,
                add_eos=dataset.add_eos,
                rc_aug=dataset.rc_aug, seed=dataset.seed,
                vocab_size=dataset.tokenizer.vocab_size, n_threads=n_threads,
            )

    def state_dict(self) -> Dict:
        return {"sampler": self.sampler.state_dict()}

    def load_state_dict(self, state: Dict) -> None:
        self.sampler.load_state_dict(state["sampler"])

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        batch_idx = []
        epoch = self.sampler.epoch
        if self._native is not None:
            for idx in self.sampler:
                batch_idx.append(idx)
                if len(batch_idx) == self.batch_size:
                    yield self._native.fill(np.asarray(batch_idx, np.int64), epoch)
                    batch_idx = []
            if batch_idx and not self.drop_last:
                # tail batch via the python path (bit-identical stream)
                xs, ys = zip(*(self.dataset.get(int(i), epoch) for i in batch_idx))
                yield {"input_ids": np.stack(xs), "targets": np.stack(ys)}
            return
        batch_x, batch_y = [], []
        for idx in self.sampler:
            x, y = self.dataset.get(idx, epoch=epoch)
            batch_x.append(x)
            batch_y.append(y)
            if len(batch_x) == self.batch_size:
                yield {
                    "input_ids": np.stack(batch_x),
                    "targets": np.stack(batch_y),
                }
                batch_x, batch_y = [], []
        if batch_x and not self.drop_last:
            yield {"input_ids": np.stack(batch_x), "targets": np.stack(batch_y)}

    def __len__(self) -> int:
        n = len(self.sampler)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)


class HG38DataModule:
    """Three-split datamodule (parity with `src/dataloaders/genomics.py:29-205`)."""

    def __init__(
        self,
        bed_file: str,
        fasta_file: str,
        max_length: int,
        batch_size: int,
        max_length_val: Optional[int] = None,
        max_length_test: Optional[int] = None,
        mlm: bool = True,
        mlm_probability: float = 0.15,
        add_eos: bool = False,
        rc_aug: bool = False,
        seed: int = 0,
        rank: int = 0,
        world_size: int = 1,
        use_native: bool = False,
    ):
        self.batch_size = batch_size
        self.seed = seed
        self.rank = rank
        self.world_size = world_size
        self.use_native = use_native
        common = dict(
            bed_file=bed_file,
            fasta_file=fasta_file,
            mlm=mlm,
            mlm_probability=mlm_probability,
            add_eos=add_eos,
            seed=seed,
        )
        self.train_ds = HG38Dataset(
            "train", max_length=max_length, rc_aug=rc_aug, **common
        )
        self.val_ds = HG38Dataset(
            "valid", max_length=max_length_val or max_length, **common
        )
        self.test_ds = HG38Dataset(
            "test", max_length=max_length_test or max_length, **common
        )
        self.tokenizer = self.train_ds.tokenizer
        self.train_sampler = ShardedShuffleSampler(
            len(self.train_ds), seed=seed, shuffle=True, rank=rank,
            world_size=world_size, drop_last=True,
        )

    def train_loader(self) -> DataLoaderIterator:
        return DataLoaderIterator(self.train_ds, self.train_sampler,
                                  self.batch_size, use_native=self.use_native)

    def eval_loader(self, split: str = "valid") -> DataLoaderIterator:
        ds = self.val_ds if split == "valid" else self.test_ds
        sampler = ShardedShuffleSampler(
            len(ds), seed=self.seed, shuffle=False, rank=self.rank,
            world_size=self.world_size,
        )
        return DataLoaderIterator(ds, sampler, self.batch_size, drop_last=False)
