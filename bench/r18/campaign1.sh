#!/bin/bash
# r18 campaign 1 — process-boundary A/B (r17 verdict item 1).
#
# Same five entries, same sf0.1 fixtures, same 32-way parallelism and 32
# shuffle partitions; the ONLY axis is the execution topology:
#   local32    — local[32], one JVM, in-process shuffle (the posture every
#                prior round measured)
#   lc4x8x6g   — local-cluster[4,8,6144]: 4 executor JVMs x 8 cores x 6g,
#                real serialized shuffle fetch / broadcast transport /
#                task-dispatch RPC (the verdict's suggested shape)
#   lc4x8x2g   — local-cluster[4,8,2048]: same topology at 8g total executor
#                memory, matching the local[32] 8g driver heap so the 6g
#                cell's 3x memory advantage can't masquerade as topology
# Entries: the CC pair the verdict names (dedup_clusters/dedup_apply — the
# co-partitioned edge cache whose benefit in-process shuffle could
# overstate) + three contrast shapes: plain hash-shuffle dedup_exact,
# banded-join dedup_minhash_lsh, windowed-agg a1a4_windowed_metrics.
# 3 fresh JVMs per cell (CC spread rule, NOTES r17), reps=2 inside each;
# min-combine offline. The local32 cells double as the r18 re-adjudication
# of the r17 dedup_apply standalone drift flag (verdict item 3).
set -e
cd /root/repo
export SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13
export SPARK_WORKER_DIR=/tmp/spark-worker
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
export SPARK_GRAFT_ONLY=dedup_clusters,dedup_apply,dedup_exact,dedup_minhash_lsh,a1a4_windowed_metrics

for i in 1 2 3; do
  SPARK_GRAFT_MASTER="local[32]" sbt -batch "runMain graft.Bench" \
    > /tmp/r18c1_local32_$i.log 2>&1
  cp BENCH_full.json bench/r18/cluster_local32_$i.json
done
for i in 1 2 3; do
  SPARK_GRAFT_MASTER="local-cluster[4,8,6144]" sbt -batch "runMain graft.Bench" \
    > /tmp/r18c1_lc6g_$i.log 2>&1
  cp BENCH_full.json bench/r18/cluster_lc4x8x6g_$i.json
done
for i in 1 2 3; do
  SPARK_GRAFT_MASTER="local-cluster[4,8,2048]" sbt -batch "runMain graft.Bench" \
    > /tmp/r18c1_lc2g_$i.log 2>&1
  cp BENCH_full.json bench/r18/cluster_lc4x8x2g_$i.json
done
echo CAMPAIGN1 DONE
