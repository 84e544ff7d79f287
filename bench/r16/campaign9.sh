#!/bin/bash
# r16 campaign 9 (NOTES follow-up 1): pressure-test the two levers the
# SCALE.md streaming section CLAIMS move the 31M-state-row wall,
# measured on the exact uniform/rocksdb workload that hit it
# (p50/p95 31.3/50.4 s at 16 threads/partitions, 4g heap):
#  - SHARDING: same workload at 32 shuffle partitions (state per shard
#    halves; also 2x threads on this box — both directions of the
#    cluster analogy);
#  - CHANGELOG CHECKPOINTING: per-batch delta upload instead of full
#    RocksDB snapshots — if a chunk of the p95 is checkpoint cost,
#    this moves it off the critical path.
set -e
cd /root/repo
export SPARK_DRIVER_MEM=4g
run_cell() { # cpus provider tag
  local out="bench/r16/streamlat2_$3.json"
  [ -s "$out" ] && { echo "== $3: cached"; return; }
  SPARK_GRAFT_CPUS=$1 SPARK_GRAFT_STREAM_LAT_OUT="$out" \
    sbt -batch "runMain graft.StreamLatency 200000 30 6 uniform $2 4000000" 2>&1 | grep -E "streamlat|OutOfMemory|Exception" | head -20 > "bench/r16/streamlat2_$3.log" || true
  echo "== $3: $(cat $out 2>/dev/null || echo 'NO ARTIFACT (see log)')"
}
run_cell 32 rocksdb uniform_rocksdb_32p
run_cell 16 rocksdb_changelog uniform_rocksdb_changelog_16p
