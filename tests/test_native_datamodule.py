"""Native-loader wiring through HG38DataModule."""

import numpy as np
import pytest

from caduceus_tpu.data import native
from caduceus_tpu.data.hg38 import HG38DataModule
from caduceus_tpu.data.synthetic import make_synthetic_genome

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


@pytest.fixture(scope="module")
def genome(tmp_path_factory):
    out = tmp_path_factory.mktemp("natdm")
    return make_synthetic_genome(str(out), n_chromosomes=2, chrom_len=1 << 14,
                                 window=1 << 12, seed=0)


def test_native_module_batches(genome):
    fasta, bed = genome
    dm = HG38DataModule(bed, fasta, max_length=1 << 10, batch_size=4,
                        mlm=True, use_native=True)
    it = iter(dm.train_loader())
    b = next(it)
    assert b["input_ids"].shape == (4, 1 << 10)
    assert b["targets"].shape == (4, 1 << 10)
    masked = (b["targets"] != 4).mean()
    assert 0.05 < masked < 0.3
    # no N ids in targets
    assert not (b["targets"] == 11).any()


def test_native_module_resume_parity(genome):
    fasta, bed = genome
    mk = lambda: HG38DataModule(bed, fasta, max_length=1 << 10, batch_size=4,
                                mlm=True, use_native=True, seed=3)
    dm1 = mk()
    l1 = dm1.train_loader()
    it = iter(l1)
    next(it)
    state = l1.state_dict()
    b_next = next(it)

    dm2 = mk()
    l2 = dm2.train_loader()
    l2.load_state_dict(state)
    b_resume = next(iter(l2))
    np.testing.assert_array_equal(b_next["input_ids"], b_resume["input_ids"])
    np.testing.assert_array_equal(b_next["targets"], b_resume["targets"])


def test_native_python_batches_bit_identical(genome):
    """Python and native loaders share the counter-based splitmix stream
    (mlm.py <-> dataloader.cc): same seed/epoch/idx -> identical batches,
    so a resumed run may switch loaders (VERDICT r1 weak-#6)."""
    fasta, bed = genome
    for kwargs in (dict(mlm=True, mlm_probability=0.15),
                   dict(mlm=True, mlm_probability=0.15, rc_aug=True),
                   dict(mlm=False, add_eos=True)):
        mk = lambda nat: HG38DataModule(bed, fasta, max_length=1 << 10,
                                        batch_size=4, seed=11,
                                        use_native=nat, **kwargs)
        b_py = next(iter(mk(False).train_loader()))
        b_nat = next(iter(mk(True).train_loader()))
        np.testing.assert_array_equal(b_py["input_ids"], b_nat["input_ids"],
                                      err_msg=str(kwargs))
        np.testing.assert_array_equal(b_py["targets"], b_nat["targets"],
                                      err_msg=str(kwargs))


def test_native_ntp_eos_target(genome):
    """Native NTP with add_eos terminates targets with SEP, matching the
    python path (reference `hg38_dataset.py:214-227`)."""
    fasta, bed = genome
    dm = HG38DataModule(bed, fasta, max_length=512, batch_size=2,
                        mlm=False, add_eos=True, use_native=True)
    b = next(iter(dm.train_loader()))
    assert b["input_ids"].shape == (2, 512)
    assert (b["targets"][:, -1] == 1).all()  # SEP
    np.testing.assert_array_equal(b["input_ids"][:, 1:], b["targets"][:, :-1])
