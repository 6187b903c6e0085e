"""Shallow (non-GG, rank-specific) search: our native engine vs the compiled
reference `utree-search` on the same box, same DB, same reads (VERDICT r3 #7).

The reference's rank-specific branch is single-threaded (no omp parallel in
that code path, itree.c:969-1007), so a one-core comparison is apples to
apples.  Outputs are also byte-compared (both single-threaded -> stable
order).

  python tools/bench_shallow.py [--refs 24] [--ref-len 100000] [--reads 200000]
"""

import argparse
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--refs", type=int, default=24)
    ap.add_argument("--ref-len", type=int, default=100_000)
    ap.add_argument("--reads", type=int, default=200_000)
    ap.add_argument("--read-len", type=int, default=150)
    a = ap.parse_args()

    from utree_tpu.config import UTreeConfig
    from utree_tpu.build import build_database
    from utree_tpu.formats import write_ubt, write_ctr_from_ubt
    from utree_tpu.oracle import build_oracle
    from utree_tpu.search_host import HostIndex, search_file_shallow
    from utree_tpu.testdata import make_toy_db, make_toy_reads

    wd = tempfile.mkdtemp(prefix="shallow_bench_")
    refs = os.path.join(wd, "refs.fa")
    taxmap = os.path.join(wd, "tax.map")
    reads = os.path.join(wd, "reads.fa")
    recs = make_toy_db(refs, taxmap, num_refs=a.refs, ref_len=a.ref_len, seed=9)
    make_toy_reads(reads, recs, num_reads=a.reads, read_len=a.read_len,
                   seed=10, mutate_prob=0.02, random_frac=0.1)

    exes = build_oracle()
    cfg = UTreeConfig(complevel=2)
    # rank-specific build: the plain (non-GG) BUILD binary
    ubt = os.path.join(wd, "db.ubt")
    ctr = os.path.join(wd, "db.ctr")
    t0 = time.perf_counter()
    res = build_database(refs, taxmap, cfg, do_gg=False)
    write_ubt(ubt, res.words, res.ixs, res.labels.strings, cfg)
    write_ctr_from_ubt(ubt, ctr, cfg)
    print(f"build: {time.perf_counter() - t0:.1f}s ({len(res.words):,} nodes)")

    env = dict(os.environ, OMP_NUM_THREADS="1")
    out_ref = os.path.join(wd, "ref.txt")
    t0 = time.perf_counter()
    subprocess.run([str(exes["utree-search"]), ctr, reads, out_ref, "1"],
                   check=True, capture_output=True, env=env)
    dt_ref = time.perf_counter() - t0
    print(f"reference utree-search (1 thread): {dt_ref:.2f}s "
          f"= {a.reads / dt_ref:,.0f} reads/s")

    idx = HostIndex.from_ctr(ctr, cfg)
    out_ours = os.path.join(wd, "ours.txt")
    t0 = time.perf_counter()
    search_file_shallow(idx, reads, out_ours, do_rc=False)
    dt = time.perf_counter() - t0
    print(f"ours (native shallow engine, 1 core): {dt:.2f}s "
          f"= {a.reads / dt:,.0f} reads/s  ratio={dt_ref / dt:.2f}x")

    same = open(out_ref, "rb").read() == open(out_ours, "rb").read()
    print("outputs byte-identical:", same)
    if not same:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
