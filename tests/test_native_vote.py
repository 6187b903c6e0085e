"""C++ vote engine vs the Python reference implementation (property test)."""

import numpy as np
import pytest

from utree_tpu.classify import aufbau_vote_counts
from utree_tpu.native import VoteEngine


def _random_taxonomies(rng, n):
    """Taxonomies with quirky shapes: blank '_' ranks, shared prefixes,
    truncated (fold-produced) strings."""
    ranks = b"kpcofgst"
    base = []
    for _ in range(n):
        depth = int(rng.integers(1, 9))
        parts = []
        for d in range(depth):
            if rng.random() < 0.15:
                parts.append(ranks[d : d + 1] + b"__")  # blank rank, ends '_'
            else:
                tok = rng.integers(97, 123, size=int(rng.integers(1, 5)), dtype=np.uint8).tobytes()
                parts.append(ranks[d : d + 1] + b"__" + tok)
        base.append(b";".join(parts))
    # add shared-prefix variants and truncations
    out = list(dict.fromkeys(base))
    for s in base[: n // 3]:
        cut = s.rfind(b";")
        if cut > 0 and s[:cut] not in out:
            out.append(s[:cut])
    return out


@pytest.fixture(scope="module")
def engine_strings():
    rng = np.random.default_rng(123)
    strings = _random_taxonomies(rng, 60)
    eng = VoteEngine(strings, taxacut=4)
    if not eng.available:
        pytest.skip("native vote lib unavailable")
    return eng, strings


def test_native_matches_python_random(engine_strings):
    eng, strings = engine_strings
    rng = np.random.default_rng(7)
    for trial in range(300):
        nu = int(rng.integers(1, min(12, len(strings))))
        ids = rng.choice(len(strings), size=nu, replace=False).astype(np.int32)
        cnts = rng.integers(1, 30, size=nu).astype(np.int32)
        name = b"q%d" % trial
        py = aufbau_vote_counts(name, ids, cnts, strings, 4)
        offs = np.array([0, nu], np.int64)
        cc = eng.vote_batch([name], offs, ids, cnts)
        expected = (py + b"\n") if py is not None else b""
        assert cc == expected, f"trial {trial}: {cc!r} != {expected!r}"


def test_native_batch_order_and_skips(engine_strings):
    eng, strings = engine_strings
    names = [b"a", b"b", b"c"]
    # read b has an empty histogram -> no line
    offs = np.array([0, 2, 2, 3], np.int64)
    ids = np.array([0, 1, 2], np.int32)
    cnts = np.array([3, 2, 1], np.int32)
    out = eng.vote_batch(names, offs, ids, cnts)
    lines = [l for l in out.split(b"\n") if l]
    assert len(lines) == 2
    assert lines[0].startswith(b"a\t")
    assert lines[1].startswith(b"c\t")
    py0 = aufbau_vote_counts(b"a", ids[:2], cnts[:2], strings, 4)
    assert lines[0] == py0


def test_native_vote_wider_than_stack_buffer():
    """Histograms wider than the C++ stack buffer (4096 entries) must grow
    onto the heap, not crash — the reference sizes its Tax_Cnt to the full
    label count (itree.c:1012-1015), so e.g. a 16Mb query hitting thousands
    of labels is a legal input.  Exercises both the CSR entry point and the
    packed entry point's override path."""
    rng = np.random.default_rng(42)
    n_wide = 5000  # > MAX_U = 4096
    strings = [b"k__a;p__b;c__c;o__d;f__e;g__g%d;s__s%d" % (i % 211, i)
               for i in range(n_wide)]
    eng = VoteEngine(strings, taxacut=4)
    if not eng.available:
        pytest.skip("native vote lib unavailable")
    ids = np.arange(n_wide, dtype=np.int32)
    cnts = rng.integers(1, 9, size=n_wide).astype(np.int32)
    py = aufbau_vote_counts(b"wide", ids, cnts, strings, 4)
    expected = (py + b"\n") if py is not None else b""

    offs = np.array([0, n_wide], np.int64)
    assert eng.vote_batch([b"wide"], offs, ids, cnts) == expected

    # packed path: one row whose nuniq exceeds the device cap, provided as an
    # override CSR (the cap-overflow contract)
    cap_cols = 8
    packed = np.zeros((1, cap_cols + 1), np.uint32)
    packed[0, cap_cols] = 31  # nuniq lane saturated: row must come via override
    out = eng.vote_packed(
        1, b"wide\x00", np.array([0], np.int64), packed, cap_cols,
        over_rows=np.array([0], np.int64),
        over_offsets=np.array([0, n_wide], np.int64),
        over_labels=ids, over_counts=cnts)
    assert out == expected


def test_native_pack_2bit_bit_identical():
    """C++ 2-bit packer must produce exactly pack_reads_host's buffers."""
    import numpy as np

    from utree_tpu.lookup import pack_reads_host
    from utree_tpu.native import FastaScanner, fasta_lib

    if fasta_lib() is None:
        import pytest

        pytest.skip("native fasta lib unavailable")
    rng = np.random.default_rng(0)
    seqs = [rng.choice(np.frombuffer(b"ACGTacgtNnX", np.uint8),
                       size=int(rng.integers(1, 180))).tobytes() for _ in range(200)]
    data = b"".join(b">r%d extra\n%s\n" % (i, s) for i, s in enumerate(seqs))
    sc = FastaScanner(data)
    lmax = 192
    p2, v2, l2, pool, offs = sc.pack_2bit(0, len(seqs), lmax)
    reads = np.zeros((len(seqs), lmax), np.uint8)
    lens = np.zeros(len(seqs), np.int32)
    for i, s in enumerate(seqs):
        reads[i, : len(s)] = np.frombuffer(s, np.uint8)
        lens[i] = len(s)
    p1, v1, l1 = pack_reads_host(reads, lens)
    assert np.array_equal(p1, p2) and np.array_equal(v1, v2) and np.array_equal(l1, l2)
    assert pool[offs[3]:offs[4] - 1] == b"r3"
