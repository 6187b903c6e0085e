"""Unit tests for DNA encoding / window sampling semantics."""

import numpy as np

from utree_tpu.encode import (
    INVALID,
    encode_bases,
    revcomp_text,
    sample_build_kmers,
    search_window_words,
    split_word,
)


def _ref_pack(seq: bytes) -> int:
    m = {65: 0, 67: 1, 71: 2, 84: 3, 97: 0, 99: 1, 103: 2, 116: 3}
    w = 0
    for b in seq:
        w = (w << 2) | m[b]
    return w


def test_encode_bases():
    codes = encode_bases(b"ACGTacgtNx-")
    assert list(codes) == [0, 1, 2, 3, 0, 1, 2, 3, INVALID, INVALID, INVALID]


def test_revcomp():
    assert revcomp_text(b"ACGTN") == b"NACGT"
    # the reference RC table maps lowercase to UPPERCASE complements (itree.c:838-841)
    assert revcomp_text(b"aacg") == b"CGTT"


def test_sample_dense_lv0():
    seq = np.random.default_rng(0).choice(list(b"ACGT"), 100).astype(np.uint8).tobytes()
    words = sample_build_kmers(seq, 32, 0)
    assert len(words) == 100 - 32 + 1
    assert words[0] == _ref_pack(seq[:32])
    assert words[-1] == _ref_pack(seq[-32:])


def test_sample_gate_lv1():
    # windows require preceding base 'A' (itree.c:605-606)
    seq = b"A" + b"C" * 32 + b"A" + b"G" * 32
    words = sample_build_kmers(seq, 32, 1)
    expected = []
    codes = seq
    for s in range(1, len(seq) - 31):
        if codes[s - 1 : s] == b"A":
            expected.append(_ref_pack(seq[s : s + 32]))
    assert list(words) == expected


def test_sample_gate_lv2_agct_prefix():
    # gate requires "AG" immediately before the window (itree.c:605-609)
    seq = b"AG" + b"T" * 32 + b"GA" + b"C" * 32
    words = sample_build_kmers(seq, 32, 2)
    assert len(words) == 1
    assert words[0] == _ref_pack(b"T" * 32)


def test_invalid_bases_break_windows():
    seq = b"A" * 40 + b"N" + b"C" * 40
    words = sample_build_kmers(seq, 32, 0)
    # windows must not span the N
    assert len(words) == (40 - 31) + (40 - 31)


def test_search_windows_rc():
    seq = b"ACGT" * 10  # 40 bases
    fwd = search_window_words(seq, 32, do_rc=False)
    both = search_window_words(seq, 32, do_rc=True)
    assert len(fwd) == 9
    # RC text appended after 'N': windows crossing the N are dropped
    assert len(both) == 18
    rc_word = _ref_pack(revcomp_text(seq)[:32])
    assert both[9] == rc_word


def test_split_word_roundtrip():
    rng = np.random.default_rng(1)
    words = rng.integers(0, 1 << 63, size=100, dtype=np.uint64)
    pre, hi, lo = split_word(words, 64, 40)
    rebuilt = (
        pre.astype(np.uint64) << np.uint64(40)
        | hi.astype(np.uint64) << np.uint64(32)
        | lo.view(np.uint32).astype(np.uint64)
    )
    assert np.array_equal(rebuilt, words)
