"""BUILD benchmark at reference scale (VERDICT r2 missing #6).

Generates a multi-GB linearized FASTA (synthetic genomes + a shared-lineage
taxonomy so the rank-flexible fold actually fires), then times:

  1. build_database_streaming  (out-of-core radix-spill build -> .ubt)
  2. write_ctr_streaming       (two-scan compress -> .ctr)
  3. optionally (--oracle) the reference utree-buildGG + utree-compress
     binaries on the same input, for a direct wall-clock comparison
     (itree.c:501-635 build driver; single-threaded by design)

  python tools/bench_build.py [--gb 2.0] [--refs 512] [--complevel 2] [--oracle]
"""

import argparse
import os
import resource
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_input(fa_path, map_path, total_bytes, num_refs, seed=11):
    rng = np.random.default_rng(seed)
    ref_len = total_bytes // num_refs
    ranks = ["k", "p", "c", "o", "f", "g", "s", "t"]
    prev = None
    with open(fa_path, "wb", buffering=1 << 22) as fa, open(map_path, "wb") as mp:
        for i in range(num_refs):
            name = b"ref%05d" % i
            # neighbors share a lineage stem (deep common prefix) so the
            # conflict fold truncates instead of marking BAD
            stem = i - (i % 4 == 1)
            tax = ";".join(
                f"{r}__{stem if d < 6 else i}x{d}" for d, r in enumerate(ranks)
            ).encode()
            mp.write(name + b"\t" + tax + b"\n")
            seq = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=ref_len)
            if prev is not None and i % 4 == 1:
                # 5% copied from the previous ref: shared k-mers under a
                # different label = real conflicts for the fold replay
                span = ref_len // 20
                src = int(rng.integers(0, ref_len - span))
                dst = int(rng.integers(0, ref_len - span))
                seq[dst : dst + span] = prev[src : src + span]
            prev = seq
            fa.write(b">" + name + b"\n")
            fa.write(seq.tobytes())
            fa.write(b"\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gb", type=float, default=2.0, help="FASTA size in GB")
    ap.add_argument("--refs", type=int, default=512)
    ap.add_argument("--complevel", type=int, default=2)
    ap.add_argument("--oracle", action="store_true",
                    help="also time the reference buildGG+compress binaries")
    ap.add_argument("--keep", action="store_true")
    a = ap.parse_args()

    from utree_tpu.build_stream import build_database_streaming, write_ctr_streaming
    from utree_tpu.config import UTreeConfig

    wd = tempfile.mkdtemp(prefix="utree_build_bench_")
    fa = os.path.join(wd, "refs.fa")
    mp = os.path.join(wd, "tax.map")
    ubt = os.path.join(wd, "db.ubt")
    ctr = os.path.join(wd, "db.ctr")

    total = int(a.gb * (1 << 30))
    t0 = time.perf_counter()
    make_input(fa, mp, total, a.refs)
    print(f"input: {os.path.getsize(fa) / (1 << 30):.2f}GB FASTA, {a.refs} refs "
          f"({time.perf_counter() - t0:.1f}s to generate)", flush=True)

    cfg = UTreeConfig(complevel=a.complevel)
    t0 = time.perf_counter()
    stats = build_database_streaming(fa, mp, cfg, ubt, workdir=wd)
    t_build = time.perf_counter() - t0
    peak_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / (1 << 20)
    print(f"build (streaming): {t_build:.1f}s -> {stats.num_nodes:,} nodes, "
          f"{stats.num_conflicted:,} conflicted, {stats.num_labels} labels; "
          f"{os.path.getsize(ubt) / (1 << 30):.2f}GB .ubt; peak RSS {peak_gb:.1f}GB "
          f"({total / t_build / 1e6:.0f} MB/s of FASTA)", flush=True)

    t0 = time.perf_counter()
    write_ctr_streaming(ubt, ctr, cfg)
    t_cmp = time.perf_counter() - t0
    print(f"compress (streaming): {t_cmp:.1f}s -> "
          f"{os.path.getsize(ctr) / (1 << 30):.2f}GB .ctr", flush=True)

    if a.oracle:
        import subprocess

        from utree_tpu.oracle import build_oracle

        bins = build_oracle()
        env = dict(os.environ, OMP_NUM_THREADS="1")
        t0 = time.perf_counter()
        subprocess.run([str(bins["utree-buildGG"]), fa, mp, ubt + ".ref", "1",
                        str(a.complevel)], check=True, env=env,
                       stdout=subprocess.DEVNULL)
        t_ref = time.perf_counter() - t0
        t0 = time.perf_counter()
        subprocess.run([str(bins["utree-compress"]), ubt + ".ref", ctr + ".ref"],
                       check=True, env=env, stdout=subprocess.DEVNULL)
        t_refc = time.perf_counter() - t0
        print(f"reference buildGG: {t_ref:.1f}s (ours {t_ref / t_build:.2f}x faster); "
              f"reference compress: {t_refc:.1f}s (ours {t_refc / t_cmp:.2f}x)",
              flush=True)
        same = (open(ubt, "rb").read(1 << 20) == open(ubt + ".ref", "rb").read(1 << 20)
                and os.path.getsize(ubt) == os.path.getsize(ubt + ".ref"))
        print(f"first-MB + size vs reference .ubt: {'EQUAL' if same else 'DIFFER'}",
              flush=True)

    if not a.keep:
        import shutil

        shutil.rmtree(wd, ignore_errors=True)


if __name__ == "__main__":
    main()
