"""On-TPU device-step bench: pure device time of the jitted search step
(pipelined dispatch, one readback at the end).

  BENCH_KMERS=20000000 python tools/bench_device_step.py

History (SURVEY §7 step 7, VERDICT r1 item 9): Pallas variants of this step
were measured here on a real v5e at the 20M-kmer tier and LOST to XLA —
full fused (pre-gather + histogram kernels) 435.8ms/batch, histogram-only
220.4ms, plain XLA 186.9ms (65536 reads x 129 windows, cap=8, do_rc).  The
step is random-gather-bound with no matmul, XLA already emits the gathers
at sector speed, and its elementwise fusion beats hand-tiled VMEM kernels
that must materialize lane-padded intermediates.  The kernels were deleted
at commit "Delete Pallas kernels" — recover them from git history if the
workload ever changes shape (e.g. a matmul-shaped rescoring pass).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    num_kmers = int(os.environ.get("BENCH_KMERS", 20_000_000))
    batch = int(os.environ.get("BENCH_BATCH", 65536))
    read_len = int(os.environ.get("BENCH_READ_LEN", 150))
    iters = int(os.environ.get("BENCH_ITERS", 8))

    import jax

    from utree_tpu.config import UTreeConfig
    from utree_tpu.encode import sample_build_kmers
    from utree_tpu.index import DeviceIndexArrays
    from utree_tpu.lookup import pack_reads_host

    cfg = UTreeConfig()
    rng = np.random.default_rng(0)
    genome_len = num_kmers + 31
    genome = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=genome_len).astype(np.uint8)
    words = sample_build_kmers(genome.tobytes(), cfg.packsize, 0)
    num_labels = 4096
    pos_labels = (np.arange(len(words), dtype=np.int64) * num_labels) // len(words)
    order = np.argsort(words, kind="stable")
    sw = words[order]
    keep = np.empty(len(sw), bool)
    keep[0] = True
    keep[1:] = sw[1:] != sw[:-1]
    sw = sw[keep]
    ixs = pos_labels[order][keep]
    labels = [b"k__a;p__b;c__c;o__d;f__e;g__f;s__g%d" % i for i in range(num_labels)]
    index = DeviceIndexArrays.from_build(sw, ixs, labels, cfg)
    print(f"index ready: {len(sw)} kmers", file=sys.stderr)

    from utree_tpu.hash_index import build_canonical_hash_index

    table = build_canonical_hash_index(index).device_put()

    starts = rng.integers(0, genome_len - read_len, size=batch)
    reads = genome[starts[:, None] + np.arange(read_len)[None, :]]
    lmax = (read_len + 15) & ~15  # same window count for both variants
    mat = np.zeros((batch, lmax), np.uint8)
    mat[:, :read_len] = reads
    lens = np.full(batch, read_len, np.int32)
    packed, vbits, plens = pack_reads_host(mat, lens)

    common = dict(k=cfg.packsize, do_rc=True, probe_iters=index.probe_iters,
                  bad_ix=min(cfg.bad_ix, 0x7FFFFFFF),
                  num_labels=index.num_labels, cap=8)

    import functools

    from utree_tpu.lookup import search_step_hist_packed

    dp, dv, dl = jax.device_put(packed), jax.device_put(vbits), jax.device_put(plens)

    for name, fn in [("xla", search_step_hist_packed)]:
        step = jax.jit(functools.partial(fn, **common))
        try:
            out = step(table, dp, dv, dl)
            ref = np.asarray(out)  # warm + materialize
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}")
            continue
        t0 = time.perf_counter()
        hs = [step(table, dp, dv, dl) for _ in range(iters)]
        np.asarray(hs[-1])  # force real completion through the tunnel
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {dt*1e3:8.1f} ms/batch  {batch/dt:,.0f} reads/s")


if __name__ == "__main__":
    main()
