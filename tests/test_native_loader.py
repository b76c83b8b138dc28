"""Native (C++) data loader: parity with the python FASTA path +
determinism + threading."""

import numpy as np
import pytest

from caduceus_tpu.data import native
from caduceus_tpu.data.fasta import FastaFile, write_fasta
from caduceus_tpu.tokenization import CaduceusTokenizer

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


@pytest.fixture(scope="module")
def fasta_pair(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("nat")
    rng = np.random.default_rng(0)
    seqs = {}
    for i in range(2):
        n = 5000 + i * 777
        seqs[f"chr{i}"] = "".join(
            np.array(list("ACGTN"))[rng.choice(5, n, p=[0.24, 0.24, 0.24, 0.24, 0.04])]
        )
    path = str(tmp / "g.fa")
    write_fasta(path, seqs, line_width=73)
    return path, seqs


def test_fasta_ids_parity(fasta_pair):
    path, seqs = fasta_pair
    tok = CaduceusTokenizer()
    py = FastaFile(path)
    nat = native.NativeFasta(path)
    assert nat.chr_lens == py.chr_lens
    for name in seqs:
        L = len(seqs[name])
        for (s, e) in [(0, L), (5, 129), (L - 61, L), (100, 100)]:
            got = nat.fetch_ids(name, s, e)
            want = py.fetch_ids(name, s, e, tok._byte_table)
            np.testing.assert_array_equal(got, want)


def test_loader_batches_and_determinism(fasta_pair):
    path, seqs = fasta_pair
    nat = native.NativeFasta(path)
    seq_len = 256
    contigs = np.array([0, 0, 1, 1], np.int32)
    starts = np.array([0, 256, 100, 999], np.int64)
    ends = starts + seq_len

    def make():
        return native.NativeHG38Loader(
            nat, contigs, starts, ends, seq_len=seq_len, batch_size=4,
            mlm=True, mlm_probability=0.15, seed=7, n_threads=4,
        )

    l1, l2 = make(), make()
    idx = np.arange(4, dtype=np.int64)
    b1 = l1.fill(idx, epoch=3)
    b2 = l2.fill(idx, epoch=3)
    np.testing.assert_array_equal(b1["input_ids"], b2["input_ids"])
    np.testing.assert_array_equal(b1["targets"], b2["targets"])
    # different epoch -> different masking
    b3 = l1.fill(idx, epoch=4)
    assert not np.array_equal(b1["input_ids"], b3["input_ids"])
    # masking stats roughly 15%
    masked = (b1["targets"] != 4).mean()
    assert 0.05 < masked < 0.30
    l1.close(); l2.close()


def test_loader_ntp_mode(fasta_pair):
    path, seqs = fasta_pair
    nat = native.NativeFasta(path)
    seq_len = 128
    contigs = np.zeros(2, np.int32)
    starts = np.array([0, 64], np.int64)
    # no-eos NTP over an L-window emits L-1 pairs (python: data=ids[:-1])
    ends = starts + seq_len
    ld = native.NativeHG38Loader(nat, contigs, starts, ends, seq_len=seq_len,
                                 batch_size=2, mlm=False)
    b = ld.fill(np.arange(2, dtype=np.int64), epoch=0)
    x, y = b["input_ids"], b["targets"]
    assert x.shape == (2, seq_len - 1)
    np.testing.assert_array_equal(x[:, 1:], y[:, :-1])
    ld.close()
    # add_eos: L pairs, SEP-terminated targets
    ld = native.NativeHG38Loader(nat, contigs, starts, ends, seq_len=seq_len,
                                 batch_size=2, mlm=False, add_eos=True)
    b = ld.fill(np.arange(2, dtype=np.int64), epoch=0)
    x, y = b["input_ids"], b["targets"]
    assert x.shape == (2, seq_len)
    assert (y[:, -1] == 1).all()
    np.testing.assert_array_equal(x[:, 1:], y[:, :-1])
    ld.close()


def test_item_matches_python_semantics(fasta_pair):
    """N→PAD and value ranges match the python HG38 path (RNG streams
    differ by design — only structural properties are compared)."""
    path, seqs = fasta_pair
    tok = CaduceusTokenizer()
    nat = native.NativeFasta(path)
    ids = nat.fetch_ids("chr0", 0, 512)
    ld = native.NativeHG38Loader(
        nat, np.zeros(1, np.int32), np.zeros(1, np.int64),
        np.array([512], np.int64), seq_len=512, batch_size=1, mlm=True,
    )
    b = ld.fill(np.zeros(1, np.int64), epoch=0)
    x, y = b["input_ids"][0], b["targets"][0]
    # targets: original token where masked (never N: N→PAD first), PAD elsewhere
    assert set(np.unique(y)).issubset({4, 7, 8, 9, 10, 3, 0, 1, 2, 5, 6, 11} - {11})
    masked = y != 4
    base = np.where(ids == 11, 4, ids)
    np.testing.assert_array_equal(y[masked], base[masked])
    # unmasked inputs unchanged — only checkable where base != PAD, since an
    # original-N position that was masked also has target PAD but mutated x
    keep = (~masked) & (base != 4)
    np.testing.assert_array_equal(x[keep], base[keep])
    ld.close()
