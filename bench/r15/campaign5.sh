#!/bin/bash
# r15 campaign 5: CC at sf3/sf30 under a 24g heap — the sf30 edge cache
# (~150M rows) starves the 8g unified pool (campaign4 OOM cells); the
# heap is the per-executor memory-sizing lever the SCALE row documents.
# Vectors stay on the 8g campaign4 numbers (they passed).
set -e
cd /root/repo
Q="dedup_clusters,dedup_apply"
export SPARK_DRIVER_MEM=24g
for sf in /tmp/sf3 /tmp/sf30; do
  tag=$(basename $sf)
  for run in 1 2; do
    out="bench/r15/steep24_${tag}_${run}.json"
    [ -s "$out" ] && { echo "== $tag run$run: cached"; continue; }
    sbt -batch "set run / envVars := Map(\"SPARK_GRAFT_SF_DIR\" -> \"$sf\", \"SPARK_GRAFT_CPUS\" -> \"32\", \"SPARK_GRAFT_ONLY\" -> \"$Q\", \"SPARK_GRAFT_CC_LOG\" -> \"1\", \"SPARK_GRAFT_BENCH_OUT\" -> \"$out\")" "runMain graft.Bench" 2>&1 | grep -E "dupClusters|metric" > "bench/r15/steep24_${tag}_${run}.log"
    echo "== $tag run$run: $(grep metric bench/r15/steep24_${tag}_${run}.log | tail -1)"
  done
done
