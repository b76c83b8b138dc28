"""Data pipeline tests: FASTA indexing, windows, MLM, sampler resume."""

import numpy as np
import pytest

from caduceus_tpu.data.fasta import FastaFile, write_fasta
from caduceus_tpu.data.hg38 import HG38Dataset, DataLoaderIterator
from caduceus_tpu.data.mlm import mlm_mask
from caduceus_tpu.data.sampler import ShardedShuffleSampler
from caduceus_tpu.data.synthetic import make_synthetic_genome
from caduceus_tpu.tokenization import CaduceusTokenizer, PAD_ID, MASK_ID


@pytest.fixture(scope="module")
def genome(tmp_path_factory):
    out = tmp_path_factory.mktemp("genome")
    return make_synthetic_genome(str(out), n_chromosomes=2, chrom_len=1 << 14,
                                 window=1 << 12, seed=0)


def test_fasta_roundtrip(tmp_path):
    seqs = {"chrA": "ACGTACGTNNACGT" * 10, "chrB": "GGGCCCAAATTT" * 7}
    path = str(tmp_path / "t.fa")
    write_fasta(path, seqs, line_width=13)  # deliberately awkward width
    fa = FastaFile(path)
    assert fa.chr_lens == {k: len(v) for k, v in seqs.items()}
    for name, seq in seqs.items():
        assert fa.fetch(name, 0, len(seq)) == seq
        assert fa.fetch(name, 5, 29) == seq[5:29]
        assert fa.fetch(name, len(seq) - 3, len(seq)) == seq[-3:]


def test_fasta_ids(tmp_path):
    tok = CaduceusTokenizer()
    path = str(tmp_path / "t.fa")
    write_fasta(path, {"c": "ACGTN"})
    fa = FastaFile(path)
    np.testing.assert_array_equal(fa.fetch_ids("c", 0, 5, tok._byte_table),
                                  [7, 8, 9, 10, 11])


def test_mlm_mask_semantics():
    rng = np.random.default_rng(0)
    seq = np.full(100_000, 7, np.int32)  # all "A"
    data, target = mlm_mask(seq, rng, mlm_probability=0.15, vocab_size=12)
    masked = target != PAD_ID
    rate = masked.mean()
    assert 0.14 < rate < 0.16
    # targets on masked positions preserve original token
    assert (target[masked] == 7).all()
    # ~80% of masked are [MASK]
    frac_mask = (data[masked] == MASK_ID).mean()
    assert 0.78 < frac_mask < 0.82
    # unmasked inputs unchanged
    assert (data[~masked] == 7).all()


def test_mlm_deterministic():
    seq = np.arange(64, dtype=np.int32) % 12
    d1, t1 = mlm_mask(seq, np.random.default_rng((1, 2, 3)))
    d2, t2 = mlm_mask(seq, np.random.default_rng((1, 2, 3)))
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_array_equal(t1, t2)


def test_hg38_dataset_windows(genome):
    fasta, bed = genome
    ds = HG38Dataset("train", bed, fasta, max_length=1 << 10, mlm=True,
                     max_allowed_length=1 << 12)
    assert ds.shifts == 4
    assert len(ds) == len(ds.rows) * 4
    x, y = ds.get(0)
    assert x.shape == (1 << 10,) and y.shape == (1 << 10,)
    assert x.dtype == np.int32
    # N ids never appear as targets (replaced with PAD before masking);
    # they CAN appear in `x` via the 10% random-vocab replacement, which the
    # reference also allows (`src/dataloaders/utils/mlm.py:28`).
    assert not (y == 11).any()


def test_hg38_ntp_mode(genome):
    fasta, bed = genome
    ds = HG38Dataset("train", bed, fasta, max_length=1 << 10, mlm=False,
                     add_eos=True, max_allowed_length=1 << 12)
    x, y = ds.get(3)
    assert x.shape == y.shape == (1 << 10,)
    # shifted by one
    np.testing.assert_array_equal(x[1:], y[:-1])


def test_hg38_deterministic_across_instances(genome):
    fasta, bed = genome
    mk = lambda: HG38Dataset("train", bed, fasta, max_length=1 << 10, mlm=True,
                             seed=7, max_allowed_length=1 << 12)
    a, b = mk(), mk()
    for idx in (0, 5, 11):
        xa, ya = a.get(idx, epoch=2)
        xb, yb = b.get(idx, epoch=2)
        np.testing.assert_array_equal(xa, xb)
        np.testing.assert_array_equal(ya, yb)


def test_sampler_shard_disjoint_and_complete():
    n = 103
    samplers = [ShardedShuffleSampler(n, seed=1, rank=r, world_size=4) for r in range(4)]
    seen = [list(s) for s in samplers]
    lens = {len(s) for s in seen}
    assert len(lens) == 1  # equal shards
    all_idx = sorted(i for shard in seen for i in shard)
    # covers every index (with wraparound padding duplicates allowed)
    assert set(all_idx) == set(range(n))


def test_sampler_resume_mid_epoch():
    n = 64
    s1 = ShardedShuffleSampler(n, seed=3)
    it = iter(s1)
    consumed = [next(it) for _ in range(20)]
    state = s1.state_dict()
    assert state == {"epoch": 0, "counter": 20}

    s2 = ShardedShuffleSampler(n, seed=3)
    s2.load_state_dict(state)
    rest_resumed = list(s2)

    s3 = ShardedShuffleSampler(n, seed=3)
    full = list(s3)
    assert consumed + rest_resumed[: n - 20] == full
    # epoch rolls over
    assert s2.epoch == 1 and s2.counter == 0


def test_loader_iterator_resume(genome):
    fasta, bed = genome
    ds = HG38Dataset("train", bed, fasta, max_length=1 << 10, mlm=True, seed=5,
                     max_allowed_length=1 << 12)
    sampler = ShardedShuffleSampler(len(ds), seed=5, drop_last=True)
    loader = DataLoaderIterator(ds, sampler, batch_size=2)
    it = iter(loader)
    b0 = next(it)
    state = loader.state_dict()
    b1 = next(it)

    sampler2 = ShardedShuffleSampler(len(ds), seed=5, drop_last=True)
    loader2 = DataLoaderIterator(ds, sampler2, batch_size=2)
    loader2.load_state_dict(state)
    b1r = next(iter(loader2))
    np.testing.assert_array_equal(b1["input_ids"], b1r["input_ids"])
    np.testing.assert_array_equal(b1["targets"], b1r["targets"])
    assert b0["input_ids"].shape == (2, 1 << 10)


def test_rc_aug_flips_some_windows(genome):
    fasta, bed = genome
    ds = HG38Dataset("train", bed, fasta, max_length=1 << 10, mlm=False,
                     rc_aug=True, seed=9, max_allowed_length=1 << 12)
    ds_no = HG38Dataset("train", bed, fasta, max_length=1 << 10, mlm=False,
                        rc_aug=False, seed=9, max_allowed_length=1 << 12)
    diffs = sum(
        int(not np.array_equal(ds.get(i)[0], ds_no.get(i)[0])) for i in range(16)
    )
    assert 0 < diffs < 16  # coin flip: some flipped, some not


# --- structured synthetic genome (r5: make_structured_genome) ---

def test_structured_genome_deterministic_and_structured(tmp_path):
    from caduceus_tpu.data.synthetic import make_structured_genome

    kw = dict(n_chromosomes=1, chrom_len=1 << 17, window=1 << 15,
              repeat_span=1 << 14, repeat_len=1 << 10, seg_len=64,
              mutation_rate=0.03, seed=3)
    fa1, bed1 = make_structured_genome(str(tmp_path / "a"), **kw)
    fa2, _ = make_structured_genome(str(tmp_path / "b"), **kw)
    s1 = open(fa1).read()
    assert s1 == open(fa2).read()  # pure function of seed

    seq = "".join(s1.split("\n")[1:])
    assert set(seq) <= set("ACGTN")
    arr = np.frombuffer(seq.encode(), np.uint8)

    # segment-library structure: 64-mers repeat far more often than in an
    # iid genome (any 16-mer recurrence is astronomically unlikely iid)
    kmers = set()
    hits = 0
    for i in range(0, len(arr) - 16, 64):
        k = seq[i:i + 16]
        hits += k in kmers
        kmers.add(k)
    assert hits > len(kmers) * 0.2

    # long-range repeats: each 2^14 block's second half shares >=1kb spans
    # with its first half (planted copies; both sides carry independent 3%
    # mutations, so test Hamming identity, not exact match — a true copy
    # pair matches at ~95.6% per base, unrelated segment-library text far
    # lower over a 256-mer spanning 4 segments)
    blk = arr[: 1 << 14]
    first, second = blk[: 1 << 13], blk[1 << 13:]
    win = np.lib.stride_tricks.sliding_window_view(first, 256)
    best = 0.0
    for off in range(0, len(second) - 256, 512):
        probe = second[off:off + 256]
        ident = (win == probe).mean(axis=1).max()
        best = max(best, float(ident))
    assert best >= 0.9


def test_structured_genome_feeds_hg38_dataset(tmp_path):
    from caduceus_tpu.data.synthetic import make_structured_genome

    fa, bed = make_structured_genome(
        str(tmp_path), n_chromosomes=2, chrom_len=1 << 15, window=1 << 12,
        repeat_span=1 << 12, repeat_len=1 << 8, seg_len=64, seed=0)
    ds = HG38Dataset("train", bed, fa, max_length=1 << 10, mlm=True, seed=1,
                     max_allowed_length=1 << 12)
    assert len(ds) > 0
    x, y = ds.get(0)
    assert x.shape == (1 << 10,) and y.shape == (1 << 10,)
    assert (y != 4).sum() > 0  # some unmasked-loss positions


def test_structured_classification_suite(tmp_path):
    from caduceus_tpu.data.classification import GENOMIC_BENCHMARK_TASKS, load_tsv
    from caduceus_tpu.data.synthetic import (
        make_structured_classification_suite, make_structured_genome)

    fa, _ = make_structured_genome(
        str(tmp_path / "g"), n_chromosomes=1, chrom_len=1 << 15,
        window=1 << 12, repeat_span=1 << 12, repeat_len=1 << 8, seg_len=64)
    d = make_structured_classification_suite(
        str(tmp_path / "t"), fa, n_train=20, n_test=8)
    for task, n_cls in GENOMIC_BENCHMARK_TASKS.items():
        seqs, labels = load_tsv(f"{d}/{task}/train.tsv")
        assert len(seqs) == 20
        assert set(int(x) for x in labels) <= set(range(n_cls))
        assert set("".join(seqs)) <= set("ACGTN")
