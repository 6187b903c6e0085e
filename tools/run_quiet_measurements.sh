#!/bin/bash
# Round-5 quiet-window measurement sweep: run AFTER the scale demos finish
# (the box must be otherwise idle — every number here is single-core
# sensitive).  Each measurement tees to a committed log.
set -u
cd /root/repo

echo "=== shallow parity $(date -u +%FT%TZ) ===" | tee bench_shallow_r5.log
python tools/bench_shallow.py 2>&1 | tee -a bench_shallow_r5.log

echo "=== xtree ALIGN parity $(date -u +%FT%TZ) ===" | tee bench_align_r5.log
python tools/bench_align.py --reads 40000 --ref 2>&1 | tee -a bench_align_r5.log

echo "=== headline 150M (device vote) $(date -u +%FT%TZ) ===" | tee bench_headline_r5.log
python bench.py 2>&1 | tee -a bench_headline_r5.log

echo "=== headline A/B: compact histogram readback $(date -u +%FT%TZ) ===" | tee -a bench_headline_r5.log
BENCH_DEVVOTE=0 BENCH_PASSES=1 python bench.py 2>&1 | tail -12 | tee -a bench_headline_r5.log
