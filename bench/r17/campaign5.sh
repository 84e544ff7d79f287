#!/bin/bash
# r17 campaign 5: the decoupled shards pair on the STRESS shape (the
# only open follow-on from campaign 4). Stress state is small (cube-
# skew caps distinct keys at ~1.4M rows) so there is no wall here; the
# question is SKEW interaction — a hot KEY is a hot group inside one
# shard, so extra shards cannot split it, and the cells should read
# ~equal if the skew story is right (the hot group is a map-side
# partial, not a hot partition).
set -e
cd /root/repo
export SPARK_DRIVER_MEM=4g
run_cell() { # cpus parts tag
  local out="bench/r17/streamlat_$3.json"
  [ -s "$out" ] && { echo "== $3: cached"; return; }
  SPARK_GRAFT_CPUS=$1 SPARK_GRAFT_STREAM_PARTITIONS=$2 \
    SPARK_GRAFT_STREAM_LAT_OUT="$out" \
    sbt -batch "runMain graft.StreamLatency 200000 30 6 stress rocksdb 4000000" 2>&1 | grep -E "streamlat|OutOfMemory|Exception" | head -20 > "bench/r17/streamlat_$3.log" || true
  echo "== $3: $(cat $out 2>/dev/null || echo 'NO ARTIFACT (see log)')"
}
run_cell 32 32 stress_rocksdb_32t32p
run_cell 32 64 stress_rocksdb_32t64p
echo "campaign5 done"
