"""On-TPU comparison: XLA search step vs fused-Pallas step at bench shape."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from utree_tpu.config import UTreeConfig
from utree_tpu.encode import sample_build_kmers
from utree_tpu.index import DeviceIndexArrays


def log(msg):
    print(msg, flush=True)


def timeit(fn, iters=6, warmup=2):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def main():
    num_kmers = int(os.environ.get("BENCH_KMERS", 20_000_000))
    B = int(os.environ.get("BENCH_BATCH", 65536))
    L = 150
    num_labels = 4096
    cfg = UTreeConfig()
    rng = np.random.default_rng(0)

    genome_len = num_kmers + 31
    genome = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=genome_len).astype(np.uint8)
    words = sample_build_kmers(genome.tobytes(), cfg.packsize, 0)
    pos_labels = (np.arange(len(words), dtype=np.int64) * num_labels) // len(words)
    order = np.argsort(words, kind="stable")
    sw = words[order]
    keep = np.empty(len(sw), bool)
    keep[0] = True
    keep[1:] = sw[1:] != sw[:-1]
    sw = sw[keep]
    ixs = pos_labels[order][keep]
    labels = [b"k__a;p__b;c__c;o__d;f__e;g__f;s__g;t__%d" % i for i in range(num_labels)]
    index = DeviceIndexArrays.from_build(sw, ixs, labels, cfg)
    from utree_tpu.hash_index import build_canonical_hash_index

    table = build_canonical_hash_index(index).device_put()
    log(f"index ready: {len(sw)} kmers; c1 {table['c1'].shape} c2 {table['c2'].shape}")

    starts = rng.integers(0, genome_len - L, size=B)
    reads = genome[starts[:, None] + np.arange(L)[None, :]]
    lmax = 192
    mat = np.zeros((B, lmax), np.uint8)
    mat[:, :L] = reads
    lens = np.full(B, L, np.int32)

    from utree_tpu.lookup import pack_reads_host, search_step_hist_packed
    from utree_tpu.kernels.fused import (search_step_hist_packed_fused,
                                         search_step_hist_packed_plhist)

    packed, vbits, lens2 = pack_reads_host(mat, lens)
    packed_d, vbits_d, lens_d = jax.device_put((packed, vbits, lens2))

    import functools

    variants = {"xla": search_step_hist_packed,
                "plhist": search_step_hist_packed_plhist}
    if os.environ.get("FULL_FUSED", "0") == "1":
        variants["fused"] = search_step_hist_packed_fused

    for cap in (16, 8):
        common = dict(k=32, do_rc=True, probe_iters=index.probe_iters,
                      bad_ix=cfg.bad_ix, num_labels=num_labels, cap=cap)
        ref = None
        for name, fn in variants.items():
            j = jax.jit(functools.partial(fn, **common))
            out = np.asarray(j(table, packed_d, vbits_d, lens_d))
            if ref is None:
                ref = out
            t = timeit(lambda: np.asarray(j(table, packed_d, vbits_d, lens_d)))
            log(f"cap={cap:2d} {name:7s} {t*1e3:7.1f} ms ({B/t:,.0f} r/s)  "
                f"identical={np.array_equal(ref, out)}")


if __name__ == "__main__":
    main()
