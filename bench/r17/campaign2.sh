#!/bin/bash
# r17 campaign 2 (verdict stretch item 7): third point on the
# uniform-wall sharding curve. r16 measured 16p (p50/p95 31.3/50.4 s,
# saturated) -> 32p (19.4/19.5 s, under trigger) on the same
# uniform/rocksdb 4M-key 200k rows/s workload at a 4g heap. A 64p cell
# on the same box says whether per-task state keeps scaling down
# before the scheduler/thread-oversubscription tax bites (the host has
# 32 cpus, so local[64] oversubscribes 2x — the pessimistic end of the
# cluster analogy, where a real cluster would add executors instead).
set -e
cd /root/repo
export SPARK_DRIVER_MEM=4g
run_cell() { # cpus provider tag
  local out="bench/r17/streamlat_$3.json"
  [ -s "$out" ] && { echo "== $3: cached"; return; }
  SPARK_GRAFT_CPUS=$1 SPARK_GRAFT_STREAM_LAT_OUT="$out" \
    sbt -batch "runMain graft.StreamLatency 200000 30 6 uniform $2 4000000" 2>&1 | grep -E "streamlat|OutOfMemory|Exception" | head -20 > "bench/r17/streamlat_$3.log" || true
  echo "== $3: $(cat $out 2>/dev/null || echo 'NO ARTIFACT (see log)')"
}
run_cell 64 rocksdb uniform_rocksdb_64p
echo "campaign2 done"
