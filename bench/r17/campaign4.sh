#!/bin/bash
# r17 campaign 4: split "more shards" from "more threads" on the
# uniform wall. The tied layout measured 16p/16t saturated, 32p/32t
# optimal, 64p/64t worse (oversubscription) — but on a cluster shard
# count and core count are independent knobs. Two cells at the fixed
# 32-thread (physical-core) layout:
#  - 64 shards / 32 threads: if per-shard state is the binding factor,
#    this should hold or beat 32/32; if per-SHARD overhead (64 RocksDB
#    instances, 2x state files per batch) dominates, it regresses and
#    the r17 64/64 regression was only partly the thread tax.
#  - (control) 32 shards / 32 threads re-run under the new
#    partitions-decoupled code path, so the comparison is same-binary.
set -e
cd /root/repo
export SPARK_DRIVER_MEM=4g
run_cell() { # cpus parts tag
  local out="bench/r17/streamlat_$3.json"
  [ -s "$out" ] && { echo "== $3: cached"; return; }
  SPARK_GRAFT_CPUS=$1 SPARK_GRAFT_STREAM_PARTITIONS=$2 \
    SPARK_GRAFT_STREAM_LAT_OUT="$out" \
    sbt -batch "runMain graft.StreamLatency 200000 30 6 uniform rocksdb 4000000" 2>&1 | grep -E "streamlat|OutOfMemory|Exception" | head -20 > "bench/r17/streamlat_$3.log" || true
  echo "== $3: $(cat $out 2>/dev/null || echo 'NO ARTIFACT (see log)')"
}
run_cell 32 32 uniform_rocksdb_32t32p
run_cell 32 64 uniform_rocksdb_32t64p
echo "campaign4 done"
# second fresh-JVM run per cell (min-combine of 2): the first pair ran
# ~2.5x slower than r16's same-layout 32p cell — this workload carries
# large session drift, so the shards-vs-threads claim is pinned on
# SAME-SESSION pairs with two samples each.
run_cell 32 32 uniform_rocksdb_32t32p_b
run_cell 32 64 uniform_rocksdb_32t64p_b
echo "campaign4b done"
