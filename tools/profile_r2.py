"""Round-2 profiling: decompose per-batch time of the single-chip search.

Run on the real TPU (no JAX_PLATFORMS override).  Axon-tunnel rules:
force readback to time (block_until_ready lies), one process at a time.

Stages measured for one (B, 150bp) batch at BENCH-shaped 20M kmers:
  enc      device: unpack 2-bit + window extraction only
  lkp      device: enc + canonical t1/t2 gathers (sum-reduced output)
  hist     device: full current step (lookup + compact_histogram cap=N)
  xfer_in  host->device put of the packed batch
  xfer_out device->host readback of the (B, cap+1) output
  pack     host: C++ 2-bit packing of one batch
  vote     host: C++ vote over typical histograms
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from utree_tpu.config import UTreeConfig
from utree_tpu.encode import sample_build_kmers
from utree_tpu.index import DeviceIndexArrays
from utree_tpu.pipeline import SearchPipeline


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def timeit(fn, iters=8, warmup=2):
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
    log(f"index ready: {len(sw)} kmers")

    starts = rng.integers(0, genome_len - L, size=B)
    reads = genome[starts[:, None] + np.arange(L)[None, :]]

    pipe = SearchPipeline(index, do_rc=True, batch_size=B)
    tbl = pipe._table
    log(f"table: c1 {tbl['c1'].shape} ({tbl['c1'].nbytes/2**20:.0f}MB)  c2 {tbl['c2'].shape} ({tbl['c2'].nbytes/2**20:.2f}MB)")

    from utree_tpu.hash_index import CANON_SLOTS, CANON_SLOTS2
    from utree_tpu.lookup import (
        base_codes_packed, compact_histogram, extract_windows,
        lookup_kmers_canonical, pack_reads_host,
    )

    lmax = 192
    reads_p = np.zeros((B, lmax), np.uint8)
    reads_p[:, :L] = reads
    lengths = np.full(B, L, np.int32)
    packed, vbits, lens = pack_reads_host(reads_p, lengths)
    packed_d = jax.device_put(packed)
    vbits_d = jax.device_put(vbits)
    lens_d = jax.device_put(lens)

    # --- device stage jits (each reduced to a scalar to avoid output xfer) --
    @jax.jit
    def enc_only(packed, vbits, lens):
        codes = base_codes_packed(packed, vbits, lens)
        qpre, qhi, qlo, valid = extract_windows(codes, 32)
        return qpre.sum() + qhi.sum() + qlo.astype(jnp.int32).sum() + valid.sum()

    @functools.partial(jax.jit, static_argnames=())
    def lkp_only(tbl, packed, vbits, lens):
        codes = base_codes_packed(packed, vbits, lens)
        qpre, qhi, qlo, valid = extract_windows(codes, 32)
        a, b = lookup_kmers_canonical(tbl, qpre, qhi, qlo, valid,
                                      slots=CANON_SLOTS, slots2=CANON_SLOTS2,
                                      bad_ix=cfg.bad_ix, do_rc=True)
        return a.sum() + b.sum()

    def hist_step(cap):
        @jax.jit
        def f(tbl, packed, vbits, lens):
            codes = base_codes_packed(packed, vbits, lens)
            qpre, qhi, qlo, valid = extract_windows(codes, 32)
            a, b = lookup_kmers_canonical(tbl, qpre, qhi, qlo, valid,
                                          slots=CANON_SLOTS, slots2=CANON_SLOTS2,
                                          bad_ix=cfg.bad_ix, do_rc=True)
            ix = jnp.concatenate([a, b], axis=1)
            labels_, counts, nuniq, found = compact_histogram(ix, num_labels, cap)
            lc = (labels_ + 1) | (counts << 16)
            tail = nuniq | (found << 5)
            return jnp.concatenate([lc, tail[:, None]], axis=1)
        return f

    def run_scalar(fn, *args):
        return lambda: float(np.asarray(fn(*args)))

    def run_mat(fn, *args):
        return lambda: np.asarray(fn(*args))

    r = {}
    r["enc"] = timeit(run_scalar(enc_only, packed_d, vbits_d, lens_d))
    log(f"enc only:            {r['enc']*1e3:8.1f} ms")
    r["lkp"] = timeit(run_scalar(lkp_only, tbl, packed_d, vbits_d, lens_d))
    log(f"enc+lookup:          {r['lkp']*1e3:8.1f} ms  (gathers ~{(r['lkp']-r['enc'])*1e3:.1f})")
    for cap in (16, 8, 4):
        f = hist_step(cap)
        r[f"hist{cap}"] = timeit(run_mat(f, tbl, packed_d, vbits_d, lens_d))
        log(f"full step (cap={cap:2d}):  {r[f'hist{cap}']*1e3:8.1f} ms  (hist+xfer ~{(r[f'hist{cap}']-r['lkp'])*1e3:.1f})")

    # transfers
    r["xfer_in"] = timeit(lambda: jax.device_put((packed, vbits, lens)) and None)
    log(f"xfer in ({packed.nbytes/2**20:.1f}+{vbits.nbytes/2**20:.1f}MB): {r['xfer_in']*1e3:8.1f} ms")
    out = hist_step(16)(tbl, packed_d, vbits_d, lens_d)
    _ = np.asarray(out)
    r["xfer_out"] = timeit(lambda: np.asarray(out))
    log(f"xfer out ({out.nbytes/2**20:.1f}MB):   {r['xfer_out']*1e3:8.1f} ms")

    # host stages
    import tempfile

    chunks = []
    for i in range(B):
        chunks.append(b">r%d\n" % i)
        chunks.append(reads[i].tobytes() + b"\n")
    data = b"".join(chunks)
    from utree_tpu.native import FastaScanner

    sc = FastaScanner(data)
    r["pack"] = timeit(lambda: sc.pack_2bit(0, B, lmax), iters=4)
    log(f"host pack_2bit:      {r['pack']*1e3:8.1f} ms")

    labels_h, counts_h, nuniq_h, found_h = pipe._unpack(out)
    nu = np.minimum(nuniq_h, 16).astype(np.int64)
    offsets = np.zeros(B + 1, np.int64)
    np.cumsum(nu, out=offsets[1:])
    mask = np.arange(16)[None, :] < nu[:, None]
    flat_l = labels_h[mask].astype(np.int32)
    flat_c = counts_h[mask].astype(np.int32)
    _, _, _, npool, noffs = sc.pack_2bit(0, B, lmax)
    r["vote"] = timeit(
        lambda: pipe._vote_engine.vote_batch_pooled(B, npool, noffs[:-1], offsets, flat_l, flat_c),
        iters=4,
    )
    log(f"host vote+format:    {r['vote']*1e3:8.1f} ms")
    log(f"unpack (np):         measuring...")
    r["unpack"] = timeit(lambda: pipe._unpack(np.asarray(out)), iters=4)
    log(f"host unpack+asarray: {r['unpack']*1e3:8.1f} ms")

    per_read = r["hist16"] / B
    log(f"\nsteady-state device step (cap16): {r['hist16']*1e3:.1f} ms => {B/r['hist16']:.0f} reads/s")
    log(f"positions: {B*(L-31)} probes, {r['lkp']-r['enc']:.3f}s gathers => {(r['lkp']-r['enc'])/(B*(L-31))*1e9:.1f} ns/probe")


if __name__ == "__main__":
    main()
