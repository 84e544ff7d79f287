#!/bin/bash
# r18 campaign 3 — the uniform streaming wall across a real process
# boundary (r17 verdict item 1, "if feasible" clause). Same workload as
# the r17 wall cells (200k rows/s uniform, 30 s trigger, 4M user keys,
# RocksDB state store), same box, same session:
#   local[32]                 — single JVM (the r17 posture)
#   local-cluster[4,8,6144]   — 4 executor JVMs x 8 cores x 6g: state
#     sharded across four RocksDB instances in four processes, shuffle
#     and checkpoint over real serialization
# 2 runs per cell (the wall drifts ~2.5x BETWEEN sittings; within a
# sitting pairs are comparable — NOTES r17). p50/p95 batch duration is
# the metric; best run per cell quoted, both recorded.
set -e
cd /root/repo
export SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13
export SPARK_WORKER_DIR=/tmp/spark-worker
export SPARK_GRAFT_CPUS=32

for i in 1 2; do
  SPARK_GRAFT_MASTER="local[32]" \
  SPARK_GRAFT_STREAM_LAT_OUT=bench/r18/streamlat_local32_$i.json \
    sbt -batch "runMain graft.StreamLatency 200000 30 6 uniform rocksdb 4000000" \
    > /tmp/r18c3_local32_$i.log 2>&1
done
for i in 1 2; do
  SPARK_GRAFT_MASTER="local-cluster[4,8,6144]" \
  SPARK_GRAFT_STREAM_LAT_OUT=bench/r18/streamlat_lc4x8x6g_$i.json \
    sbt -batch "runMain graft.StreamLatency 200000 30 6 uniform rocksdb 4000000" \
    > /tmp/r18c3_lc6g_$i.log 2>&1
done
echo CAMPAIGN3 DONE
