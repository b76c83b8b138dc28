"""ctypes bindings for the native (C++) data loader.

The shared library (native/dataloader.cc) provides mmap'd FASTA indexing,
tokenization, deterministic MLM masking, and a pthread worker pool —
replacing the reference's pyfaidx + torch-DataLoader-workers hot path with
zero Python per item. Falls back gracefully: callers check
:func:`available` and use the pure-python HG38Dataset otherwise.

Build: scripts/build_native.sh (g++ -O3 -shared -fPIC).
"""

from __future__ import annotations

import ctypes
import os
from typing import Dict, Iterator, Optional

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libcaduceus_data.so",
)

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.fasta_open.restype = ctypes.c_void_p
    lib.fasta_open.argtypes = [ctypes.c_char_p]
    lib.fasta_num_contigs.restype = ctypes.c_int
    lib.fasta_num_contigs.argtypes = [ctypes.c_void_p]
    lib.fasta_contig_name.restype = ctypes.c_char_p
    lib.fasta_contig_name.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.fasta_contig_length.restype = ctypes.c_int64
    lib.fasta_contig_length.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.fasta_fetch_ids.restype = ctypes.c_int64
    lib.fasta_fetch_ids.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.fasta_close.argtypes = [ctypes.c_void_p]
    lib.hg38_item.restype = ctypes.c_int64
    lib.hg38_item.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ctypes.c_int, ctypes.c_double, ctypes.c_int, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.loader_create.restype = ctypes.c_void_p
    lib.loader_create.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_int,
        ctypes.c_int, ctypes.c_int64, ctypes.c_int32, ctypes.c_int,
    ]
    lib.loader_fill_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.loader_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _i64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


class NativeFasta:
    """mmap'd FASTA via the native indexer."""

    def __init__(self, path: str):
        lib = _load()
        assert lib is not None, "native library not built (scripts/build_native.sh)"
        self._lib = lib
        self._h = lib.fasta_open(path.encode())
        if not self._h:
            raise OSError(f"failed to open FASTA: {path}")
        n = lib.fasta_num_contigs(self._h)
        self.names = [lib.fasta_contig_name(self._h, i).decode() for i in range(n)]
        self.index = {name: i for i, name in enumerate(self.names)}
        self.chr_lens = {
            name: int(lib.fasta_contig_length(self._h, i))
            for i, name in enumerate(self.names)
        }

    def length(self, name: str) -> int:
        return self.chr_lens[name]

    def fetch_ids(self, name: str, start: int, end: int) -> np.ndarray:
        out = np.empty(max(0, end - start), np.int32)
        n = self._lib.fasta_fetch_ids(
            self._h, self.index[name], start, end, _i32p(out)
        )
        return out[: max(0, n)]

    def close(self):
        if self._h:
            self._lib.fasta_close(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


class NativeHG38Loader:
    """Batched, multithreaded item producer over precomputed windows.

    Windows (contig_idx, start, end) are computed in python (BED parsing and
    boundary clamping stay in HG38Dataset); the native side does extraction,
    tokenization, N→PAD, rc-aug, and MLM/NTP target construction in a
    worker pool directly into the output numpy buffers.
    """

    def __init__(
        self,
        fasta: NativeFasta,
        contigs: np.ndarray,  # (n,) int32 contig indices
        starts: np.ndarray,   # (n,) int64
        ends: np.ndarray,     # (n,) int64
        seq_len: int,
        batch_size: int,
        mlm: bool = True,
        mlm_probability: float = 0.15,
        add_eos: bool = False,
        rc_aug: bool = False,
        seed: int = 0,
        vocab_size: int = 12,
        n_threads: int = 8,
    ):
        lib = _load()
        assert lib is not None
        self._lib = lib
        self.fasta = fasta
        # output row length: NTP without eos yields seq_len-1 items
        # (data=ids[:-1]); MLM and eos-NTP yield seq_len
        self.out_len = seq_len if (mlm or add_eos) else seq_len - 1
        self.seq_len = seq_len
        self.batch_size = batch_size
        contigs = np.ascontiguousarray(contigs, np.int32)
        starts = np.ascontiguousarray(starts, np.int64)
        ends = np.ascontiguousarray(ends, np.int64)
        self.n_windows = len(contigs)
        self._h = lib.loader_create(
            fasta._h, _i32p(contigs), _i64p(starts), _i64p(ends),
            len(contigs), self.out_len, batch_size, int(mlm), mlm_probability,
            int(add_eos), int(rc_aug), seed, vocab_size, n_threads,
        )
        self._x = np.empty((batch_size, self.out_len), np.int32)
        self._y = np.empty((batch_size, self.out_len), np.int32)

    def fill(self, indices: np.ndarray, epoch: int) -> Dict[str, np.ndarray]:
        indices = np.ascontiguousarray(indices, np.int64)
        assert len(indices) == self.batch_size
        self._lib.loader_fill_batch(
            self._h, _i64p(indices), len(indices), epoch,
            _i32p(self._x), _i32p(self._y),
        )
        return {"input_ids": self._x.copy(), "targets": self._y.copy()}

    def close(self):
        if self._h:
            self._lib.loader_destroy(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
