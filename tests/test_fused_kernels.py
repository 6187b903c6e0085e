"""Fused Pallas kernels must be bit-identical to the XLA canonical path."""

import numpy as np

from utree_tpu.config import UTreeConfig
from utree_tpu.index import DeviceIndexArrays
from utree_tpu.lookup import pack_reads_host, search_step_hist_packed


def _synthetic_index(num_kmers=200_000, num_labels=97, seed=3):
    from utree_tpu.encode import sample_build_kmers

    cfg = UTreeConfig()
    rng = np.random.default_rng(seed)
    genome = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=num_kmers + 31).astype(np.uint8)
    words = sample_build_kmers(genome.tobytes(), cfg.packsize, 0)
    pos_labels = (np.arange(len(words), dtype=np.int64) * num_labels) // len(words)
    order = np.argsort(words, kind="stable")
    sw = words[order]
    keep = np.empty(len(sw), bool)
    keep[0] = True
    keep[1:] = sw[1:] != sw[:-1]
    labels = [b"k__a;p__b;c__c;o__%d;f__e;g__f;s__g;t__%d" % (i % 7, i)
              for i in range(num_labels)]
    idx = DeviceIndexArrays.from_build(sw[keep], pos_labels[order][keep], labels, cfg)
    return cfg, genome, idx


def _batch_from(genome, rng, b, l):
    starts = rng.integers(0, len(genome) - l, size=b)
    reads = genome[starts[:, None] + np.arange(l)[None, :]]
    mut = rng.random(reads.shape) < 0.02
    reads[mut] = rng.choice(np.frombuffer(b"ACGTN", np.uint8), size=int(mut.sum()))
    lmax = (l + 63) & ~63
    mat = np.zeros((b, lmax), np.uint8)
    mat[:, :l] = reads
    lens = np.full(b, l, np.int32)
    # a few short/odd rows
    lens[0] = 31  # shorter than k: all windows invalid
    lens[1] = 45
    mat[2, :] = ord("N")
    return pack_reads_host(mat, lens)


def test_fused_step_bit_identical_to_xla():
    from utree_tpu.hash_index import build_canonical_hash_index
    from utree_tpu.kernels.fused import search_step_hist_packed_fused

    cfg, genome, idx = _synthetic_index()
    table = build_canonical_hash_index(idx).device_put()
    rng = np.random.default_rng(11)
    packed, vbits, lens = _batch_from(genome, rng, 96, 150)
    common = dict(k=32, do_rc=True, probe_iters=idx.probe_iters,
                  bad_ix=cfg.bad_ix, num_labels=idx.num_labels, cap=16)
    want = np.asarray(search_step_hist_packed(table, packed, vbits, lens, **common))
    got = np.asarray(search_step_hist_packed_fused(table, packed, vbits, lens, **common))
    assert np.array_equal(want, got)


def test_fused_step_no_rc_and_cap8():
    from utree_tpu.hash_index import build_canonical_hash_index
    from utree_tpu.kernels.fused import search_step_hist_packed_fused

    cfg, genome, idx = _synthetic_index(seed=5)
    table = build_canonical_hash_index(idx).device_put()
    rng = np.random.default_rng(13)
    packed, vbits, lens = _batch_from(genome, rng, 64, 120)
    for do_rc, cap in ((False, 16), (True, 8), (False, 4)):
        common = dict(k=32, do_rc=do_rc, probe_iters=idx.probe_iters,
                      bad_ix=cfg.bad_ix, num_labels=idx.num_labels, cap=cap)
        want = np.asarray(search_step_hist_packed(table, packed, vbits, lens, **common))
        got = np.asarray(search_step_hist_packed_fused(table, packed, vbits, lens, **common))
        assert np.array_equal(want, got), (do_rc, cap)


def test_fused_step_empty_spill():
    """DBs whose canonical table has no spill skip the t2 gather entirely."""
    from utree_tpu.hash_index import build_canonical_hash_index
    from utree_tpu.kernels.fused import search_step_hist_packed_fused

    cfg, genome, idx = _synthetic_index(num_kmers=40, num_labels=5, seed=9)
    table = build_canonical_hash_index(idx).device_put()
    assert table["c2"].shape[0] <= 8  # tiny DB -> no spill
    rng = np.random.default_rng(17)
    packed, vbits, lens = _batch_from(genome, rng, 32, 40)
    common = dict(k=32, do_rc=True, probe_iters=idx.probe_iters,
                  bad_ix=cfg.bad_ix, num_labels=idx.num_labels, cap=16)
    want = np.asarray(search_step_hist_packed(table, packed, vbits, lens, **common))
    got = np.asarray(search_step_hist_packed_fused(table, packed, vbits, lens, **common))
    assert np.array_equal(want, got)
