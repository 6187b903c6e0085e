#!/bin/bash
# Round-5 flagship-scale demonstration queue (VERDICT r4 items 1 and 7).
# The 150M bench cache is warmed separately (warmcache_r5.log); this runs
# the 500M and 1.2G routed-shards demonstrations to completion, each with
# its own committed log.  --fast-lambda on both: placement time is the
# blocker on this 1-core box and both lambda choices are exact (the probe
# reads the stored seeds).
set -u
cd /root/repo

echo "=== 500M demonstration starting $(date -u +%FT%TZ) ===" > bench500m_r5.log
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  timeout 21600 python tools/bench_500m.py --kmers 500000000 --shards 8 --fast-lambda \
  >> bench500m_r5.log 2>&1
echo "=== exit $? at $(date -u +%FT%TZ) ===" >> bench500m_r5.log

echo "=== 1.2G demonstration starting $(date -u +%FT%TZ) ===" > bench1200m_r5.log
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  timeout 28800 python tools/bench_500m.py --kmers 1200000000 --shards 8 --fast-lambda \
  >> bench1200m_r5.log 2>&1
echo "=== exit $? at $(date -u +%FT%TZ) ===" >> bench1200m_r5.log
