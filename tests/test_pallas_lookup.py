"""Pallas lookup kernel vs the XLA gather path (interpret mode on CPU)."""

import numpy as np
import pytest

from utree_tpu.config import UTreeConfig
from utree_tpu.index import DeviceIndexArrays


@pytest.fixture(scope="module")
def small_index():
    rng = np.random.default_rng(0)
    cfg = UTreeConfig()
    # concentrated prefixes -> big bins to exercise the narrow phase
    # (kept small: interpret mode executes the kernel per element)
    pre = rng.integers(0, 16, size=2000, dtype=np.uint64)
    suf = rng.integers(0, 1 << 40, size=2000, dtype=np.uint64)
    words = np.unique((pre << np.uint64(40)) | suf)
    ixs = rng.integers(0, 500, size=len(words)).astype(np.int64)
    labels = [b"l%d" % i for i in range(500)]
    return DeviceIndexArrays.from_build(words, ixs, labels, cfg), cfg


def test_pallas_matches_xla(small_index):
    from utree_tpu.kernels.lookup_pallas import pallas_lookup_kmers
    from utree_tpu.lookup import lookup_kmers

    index, cfg = small_index
    rng = np.random.default_rng(3)
    # mix: actual table words (hits) + randoms (mostly misses)
    suffixes = (index.suf_hi[:-1].astype(np.uint64) << np.uint64(32)) | index.suf_lo[:-1].view(
        np.uint32
    ).astype(np.uint64)
    n_hit = 40
    pick = rng.integers(0, index.num_records, size=n_hit)
    pre_of = np.searchsorted(index.bin_ix[:-1].astype(np.int64), pick, side="right") - 1
    w_hit = (pre_of.astype(np.uint64) << np.uint64(40)) | suffixes[pick]
    # randoms within populated prefixes (some with high bit set in the lo
    # lane to cover the unsigned-compare path) + fully random misses
    w_near = (rng.integers(0, 16, size=20, dtype=np.uint64) << np.uint64(40)) | rng.integers(
        0, 1 << 40, size=20, dtype=np.uint64
    )
    w_rand = rng.integers(0, 1 << 49, size=4, dtype=np.uint64)
    words = np.concatenate([w_hit, w_near, w_rand])

    qpre = (words >> np.uint64(40)).astype(np.int32)
    qhi = ((words >> np.uint64(32)) & np.uint64(0xFF)).astype(np.int32)
    qlo = (words & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.int32)
    valid = np.ones(len(words), bool)

    table = index.device_put(with_packed=True)
    ref = np.asarray(lookup_kmers(table, qpre, qhi, qlo, valid, index.probe_iters, cfg.bad_ix))
    out = np.asarray(
        pallas_lookup_kmers(
            table, qpre, qhi, qlo, valid, index.probe_iters, cfg.bad_ix,
            window=16, block=32, interpret=True,
        )
    )
    assert np.array_equal(ref, out)
    assert (ref != cfg.bad_ix).sum() >= n_hit  # the planted hits actually hit
