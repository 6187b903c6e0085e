"""Hash lookup path: exact equality with the probe-replay path, including the
compressor's quirky bin-table cases."""

import numpy as np
import pytest

from utree_tpu.config import UTreeConfig
from utree_tpu.hash_index import _rc64, build_canonical_hash_index, build_hash_index
from utree_tpu.index import DeviceIndexArrays
from utree_tpu.lookup import lookup_kmers, lookup_kmers_canonical, lookup_kmers_hash


def _check_equal(index, cfg, words):
    qpre = (words >> np.uint64(40)).astype(np.int32)
    qhi = ((words >> np.uint64(32)) & np.uint64(0xFF)).astype(np.int32)
    qlo = (words & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    valid = np.ones(len(words), bool)
    bs_table = index.device_put()
    ref = np.asarray(lookup_kmers(bs_table, qpre, qhi, qlo, valid, index.probe_iters, cfg.bad_ix))
    hx = build_hash_index(index).device_put()
    out = np.asarray(lookup_kmers_hash(hx, qpre, qhi, qlo, valid, slots=8, bad_ix=cfg.bad_ix))
    assert np.array_equal(ref, out)
    return ref


def test_hash_equals_bsearch_random():
    rng = np.random.default_rng(0)
    cfg = UTreeConfig()
    words = np.unique(rng.integers(0, 1 << 63, size=50_000, dtype=np.uint64))
    ixs = rng.integers(0, 900, size=len(words)).astype(np.int64)
    index = DeviceIndexArrays.from_build(words, ixs, [b"l%d" % i for i in range(900)], cfg)
    q = np.concatenate([
        rng.choice(words, 2000),
        rng.integers(0, 1 << 63, size=2000, dtype=np.uint64),
    ])
    ref = _check_equal(index, cfg, q)
    assert (ref != cfg.bad_ix).sum() >= 2000


def test_hash_equals_bsearch_singleton_first_bin():
    """First populated bin holding exactly one record triggers the
    compressor's off-by-one quirk (the record becomes unreachable and the
    next bin's probe range swallows it, formats.compute_bin_ix) — the hash
    must reproduce that, not true membership."""
    cfg = UTreeConfig()
    rng = np.random.default_rng(1)
    w0 = np.uint64(5) << np.uint64(40) | np.uint64(1234)  # singleton bin 5
    rest = (np.uint64(9) << np.uint64(40)) | rng.integers(0, 1 << 40, size=50, dtype=np.uint64)
    more = (np.uint64(700) << np.uint64(40)) | rng.integers(0, 1 << 40, size=50, dtype=np.uint64)
    words = np.unique(np.concatenate([[w0], rest, more]))
    ixs = np.arange(len(words)) % 7
    index = DeviceIndexArrays.from_build(words, ixs, [b"l%d" % i for i in range(7)], cfg)

    # queries: the singleton itself (reference misses it!), its suffix under
    # the neighboring prefix (reference may find it), every real word, randoms
    cross = np.uint64(9) << np.uint64(40) | np.uint64(1234)
    q = np.concatenate([[w0, cross], words, rng.integers(0, 1 << 63, size=500, dtype=np.uint64)])
    ref = _check_equal(index, cfg, q)
    # quirk sanity: the singleton word itself is NOT findable via its own prefix
    assert ref[0] == cfg.bad_ix


def test_hash_handles_contaminated_range():
    """Bin-0-populated case: bin 0's start stays quirky and early bins merge."""
    cfg = UTreeConfig()
    rng = np.random.default_rng(2)
    b0 = (np.uint64(0) << np.uint64(40)) | np.sort(rng.integers(0, 1 << 40, size=20, dtype=np.uint64))
    b1 = (np.uint64(1) << np.uint64(40)) | np.sort(rng.integers(0, 1 << 40, size=20, dtype=np.uint64))
    b9 = (np.uint64(9) << np.uint64(40)) | rng.integers(0, 1 << 40, size=20, dtype=np.uint64)
    words = np.unique(np.concatenate([b0, b1, b9]))
    ixs = np.arange(len(words)) % 5
    index = DeviceIndexArrays.from_build(words, ixs, [b"l%d" % i for i in range(5)], cfg)
    q = np.concatenate([words, rng.integers(0, 1 << 42, size=1000, dtype=np.uint64)])
    _check_equal(index, cfg, q)


def _lanes(words):
    qpre = (words >> np.uint64(40)).astype(np.int32)
    qhi = ((words >> np.uint64(32)) & np.uint64(0xFF)).astype(np.int32)
    qlo = (words & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    return qpre, qhi, qlo


def _canonical_case(words, ixs, nlab, queries, valid=None):
    """Canonical path vs probe-replay ground truth, both strands."""
    cfg = UTreeConfig()
    index = DeviceIndexArrays.from_build(words, ixs, [b"l%d" % i for i in range(nlab)], cfg)
    bs = index.device_put()
    qpre, qhi, qlo = _lanes(queries)
    if valid is None:
        valid = np.ones(len(queries), bool)
    ref_f = np.asarray(lookup_kmers(bs, qpre, qhi, qlo, valid, index.probe_iters, cfg.bad_ix))
    rc = _rc64(queries)
    rpre, rhi, rlo = _lanes(rc)
    ref_r = np.asarray(lookup_kmers(bs, rpre, rhi, rlo, valid, index.probe_iters, cfg.bad_ix))
    built = build_canonical_hash_index(index)
    ch = built.device_put()
    ixa, ixb = lookup_kmers_canonical(ch, qpre, qhi, qlo, valid, slots=built.slots,
                                      slots2=built.slots2, bad_ix=cfg.bad_ix, do_rc=True)
    ixa, ixb = np.asarray(ixa), np.asarray(ixb)
    # per-position hit multiset must match {lookup(f), lookup(rc f)}
    got = np.sort(np.stack([ixa, ixb]), axis=0)
    want = np.sort(np.stack([ref_f, ref_r]), axis=0)
    assert np.array_equal(got, want)
    # non-RC variant returns exactly the forward-strand result
    fwd = np.asarray(lookup_kmers_canonical(ch, qpre, qhi, qlo, valid, slots=built.slots,
                                            slots2=built.slots2, bad_ix=cfg.bad_ix, do_rc=False))
    assert np.array_equal(fwd, ref_f)
    return ref_f, ref_r


def test_canonical_equals_two_strand_bsearch_random():
    rng = np.random.default_rng(3)
    cfg = UTreeConfig()
    words = np.unique(rng.integers(0, 1 << 64, size=60_000, dtype=np.uint64))
    ixs = rng.integers(0, 900, size=len(words)).astype(np.int64)
    q = np.concatenate([
        rng.choice(words, 1500),
        _rc64(rng.choice(words, 1500)),          # queries whose RC is in the DB
        rng.integers(0, 1 << 64, size=2000, dtype=np.uint64),
    ])
    ref_f, ref_r = _canonical_case(words, ixs, 900, q)
    assert (ref_f != cfg.bad_ix).sum() >= 1500
    assert (ref_r != cfg.bad_ix).sum() >= 1500


def test_canonical_rc_pairs_and_palindromes():
    """DB containing both w and rc(w) under different labels, plus a
    palindromic 32-mer (rc(w) == w) which must hit on BOTH scans."""
    rng = np.random.default_rng(4)
    base = np.unique(rng.integers(0, 1 << 64, size=300, dtype=np.uint64))
    pal_half = rng.integers(0, 1 << 32, size=50, dtype=np.uint64)
    # palindrome condition: high32(w) == rev2(~low32(w)); _rc64(h) with h < 2^32
    # carries exactly rev2(~h) in its high half
    pal = (_rc64(pal_half) & np.uint64(0xFFFFFFFF00000000)) | pal_half
    pal = pal[pal == _rc64(pal)]
    assert len(pal) > 0
    words = np.unique(np.concatenate([base, _rc64(base), pal]))
    ixs = (np.arange(len(words)) % 11).astype(np.int64)
    q = np.concatenate([words, _rc64(words), rng.integers(0, 1 << 64, size=500, dtype=np.uint64)])
    _canonical_case(words, ixs, 11, q)


def test_canonical_invalid_windows_masked():
    rng = np.random.default_rng(5)
    words = np.unique(rng.integers(0, 1 << 64, size=5000, dtype=np.uint64))
    ixs = rng.integers(0, 30, size=len(words)).astype(np.int64)
    q = rng.choice(words, 800)
    valid = rng.random(len(q)) < 0.5
    cfg = UTreeConfig()
    index = DeviceIndexArrays.from_build(words, ixs, [b"l%d" % i for i in range(30)], cfg)
    built = build_canonical_hash_index(index)
    ch = built.device_put()
    qpre, qhi, qlo = _lanes(q)
    ixa, ixb = lookup_kmers_canonical(ch, qpre, qhi, qlo, valid, slots=built.slots,
                                      slots2=built.slots2, bad_ix=cfg.bad_ix, do_rc=True)
    assert np.all(np.asarray(ixa)[~valid] == cfg.bad_ix)
    assert np.all(np.asarray(ixb)[~valid] == cfg.bad_ix)


def test_canonical_spill_paths(monkeypatch):
    """Force t1 growth + a populated wide-row t2 with a tiny spill budget,
    and check exactness end to end (this regime hid three real bugs: spill
    overflow at scale, the growth spiral, and out-of-cache t2)."""
    import utree_tpu.hash_index as H

    monkeypatch.setattr(H, "_CANON_T2_BUDGET", 256)  # ~21 entries allowed
    rng = np.random.default_rng(6)
    words = np.unique(rng.integers(0, 1 << 64, size=30_000, dtype=np.uint64))
    ixs = rng.integers(0, 50, size=len(words)).astype(np.int64)
    q = np.concatenate([rng.choice(words, 3000),
                        rng.integers(0, 1 << 64, size=1000, dtype=np.uint64)])
    _canonical_case(words, ixs, 50, q)


def test_canonical_no_spill_skips_t2():
    """A tiny build has no spill; t2 must be the 8-row sentinel (the probe is
    statically skipped)."""
    rng = np.random.default_rng(7)
    words = np.unique(rng.integers(0, 1 << 64, size=12, dtype=np.uint64))
    ixs = rng.integers(0, 5, size=len(words)).astype(np.int64)
    cfg = UTreeConfig()
    index = DeviceIndexArrays.from_build(words, ixs, [b"l%d" % i for i in range(5)], cfg)
    built = build_canonical_hash_index(index)
    assert built.t2.shape[0] == 8
    q = np.concatenate([words, rng.integers(0, 1 << 64, size=200, dtype=np.uint64)])
    _canonical_case(words, ixs, 5, q)


@pytest.mark.parametrize("slots,load,slots2,slots3", [
    (4, 0.28, 16, 0),  # 2-sector rows, cached t2
    (4, 4.0, 8, 0),    # ladder tier C shape: overloaded t1 -> big HBM t2
    (4, 4.0, 2, 16),   # ladder tier B shape: 3-level chain, heavy spill
    (2, 8.0, 2, 16),   # extreme overload: t3 takes a large tail
])
def test_canonical_geometry_tiers_exact(slots, load, slots2, slots3):
    """The geometry LADDER tiers (big-DB degradation) answer identically to
    the probe-replay ground truth: the lookup derives slot counts from the
    table shapes, so any placed geometry must be exact."""
    rng = np.random.default_rng(11)
    words = np.unique(rng.integers(0, 1 << 64, size=40_000, dtype=np.uint64))
    ixs = rng.integers(0, 64, size=len(words)).astype(np.int64)
    cfg = UTreeConfig()
    index = DeviceIndexArrays.from_build(words, ixs, [b"l%d" % i for i in range(64)], cfg)
    bs = index.device_put()
    queries = np.concatenate([rng.choice(words, 4000),
                              rng.integers(0, 1 << 64, size=1000, dtype=np.uint64)])
    qpre, qhi, qlo = _lanes(queries)
    valid = np.ones(len(queries), bool)
    ref_f = np.asarray(lookup_kmers(bs, qpre, qhi, qlo, valid, index.probe_iters, cfg.bad_ix))
    rc = _rc64(queries)
    rpre, rhi, rlo = _lanes(rc)
    ref_r = np.asarray(lookup_kmers(bs, rpre, rhi, rlo, valid, index.probe_iters, cfg.bad_ix))
    from utree_tpu.hash_index import _canonical_groups, _place_canonical

    if slots3:
        g = _canonical_groups(index)
        built = _place_canonical(*g, slots, load, slots2, 1 << 27, slots3=slots3)
        assert built.t3.shape[0] > 8, "t3 tail not exercised"
    else:
        built = build_canonical_hash_index(index, slots=slots, load=load, slots2=slots2)
    assert built.t1.shape[1] == slots * 3
    ch = built.device_put()
    ixa, ixb = lookup_kmers_canonical(ch, qpre, qhi, qlo, valid, slots=built.slots,
                                      slots2=built.slots2, bad_ix=cfg.bad_ix, do_rc=True)
    got = np.sort(np.stack([np.asarray(ixa), np.asarray(ixb)]), axis=0)
    want = np.sort(np.stack([ref_f, ref_r]), axis=0)
    assert np.array_equal(got, want)


def test_canonical_wide_labels_exact():
    """IXTYPE=u32 DBs (label ids >= 65535) keep the canonical fast path via
    WIDE 4-col slots; the dual-value multiset contract must hold."""
    rng = np.random.default_rng(21)
    words = np.unique(rng.integers(0, 1 << 64, size=30_000, dtype=np.uint64))
    nlab = 70_000  # > 2^16 - 1
    ixs = rng.integers(0, nlab, size=len(words)).astype(np.int64)
    cfg = UTreeConfig(ixtype_bytes=4)
    index = DeviceIndexArrays.from_build(words, ixs, [b"l%d" % i for i in range(nlab)], cfg)
    bs = index.device_put()
    queries = np.concatenate([rng.choice(words, 3000),
                              rng.integers(0, 1 << 64, size=1000, dtype=np.uint64)])
    qpre, qhi, qlo = _lanes(queries)
    valid = np.ones(len(queries), bool)
    bad = min(cfg.bad_ix, 0x7FFFFFFF)
    ref_f = np.asarray(lookup_kmers(bs, qpre, qhi, qlo, valid, index.probe_iters, bad))
    rc = _rc64(queries)
    rpre, rhi, rlo = _lanes(rc)
    ref_r = np.asarray(lookup_kmers(bs, rpre, rhi, rlo, valid, index.probe_iters, bad))
    built = build_canonical_hash_index(index)
    assert built.t1.shape[1] == built.slots * 4, "expected WIDE slots"
    ch = built.device_put()
    ixa, ixb = lookup_kmers_canonical(ch, qpre, qhi, qlo, valid, slots=built.slots,
                                      slots2=built.slots2, bad_ix=bad, do_rc=True,
                                      wide=True)
    got = np.sort(np.stack([np.asarray(ixa), np.asarray(ixb)]), axis=0)
    want = np.sort(np.stack([ref_f, ref_r]), axis=0)
    assert np.array_equal(got, want)
    # non-RC variant returns exactly the forward-strand result
    fwd = np.asarray(lookup_kmers_canonical(ch, qpre, qhi, qlo, valid, slots=built.slots,
                                            slots2=built.slots2, bad_ix=bad,
                                            do_rc=False, wide=True))
    assert np.array_equal(fwd, ref_f)


def test_wide_pipeline_modes_agree(tmp_path):
    """End-to-end device pipeline with >65535 labels: the canonical WIDE
    path, plain hash, and bsearch replay must produce identical output
    bytes (and the pipeline must keep the 2-bit input path)."""
    from utree_tpu.pipeline import SearchPipeline
    from utree_tpu.testdata import make_toy_db, make_toy_reads
    from utree_tpu.build import build_database
    from utree_tpu.formats import write_ctr_from_ubt, write_ubt

    recs = make_toy_db(str(tmp_path / "refs.fa"), str(tmp_path / "tax.map"),
                       num_refs=10, ref_len=3000, seed=77)
    make_toy_reads(str(tmp_path / "reads.fa"), recs, num_reads=200,
                   read_len=120, seed=78)
    cfg = UTreeConfig(ixtype_bytes=4, complevel=2)
    res = build_database(str(tmp_path / "refs.fa"), str(tmp_path / "tax.map"), cfg)
    write_ubt(str(tmp_path / "db.ubt"), res.words, res.ixs, res.labels.strings, cfg)
    write_ctr_from_ubt(str(tmp_path / "db.ubt"), str(tmp_path / "db.ctr"), cfg)
    outs = {}
    for mode in ("canonical", "hash", "bsearch"):
        idx = DeviceIndexArrays.from_ctr(str(tmp_path / "db.ctr"), cfg)
        # force the WIDE entry layout: pretend the label space is u32-sized
        # by padding the string table past 2^16
        idx.strings = idx.strings + [b"pad%d" % i for i in range(70_000 - len(idx.strings))]
        pipe = SearchPipeline(idx, do_rc=True, batch_size=64, lookup_mode=mode)
        if mode == "canonical":
            assert pipe.table_kind == "canonical"
            assert pipe._table["c1"].shape[1] % 4 == 0
            assert pipe._packed and not pipe._packed_out
        pipe.search_file(str(tmp_path / "reads.fa"), str(tmp_path / f"out_{mode}.txt"))
        outs[mode] = (tmp_path / f"out_{mode}.txt").read_bytes()
    assert outs["canonical"] == outs["hash"] == outs["bsearch"]
    assert outs["canonical"], "output should be non-empty"
