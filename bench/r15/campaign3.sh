#!/bin/bash
# r15 campaign 3: CC family on the PLAIN fixtures after the shuffle-layout
# rework — refresh the standard multi-point fits (sf0.1 -> sf1 -> sf10).
# 2 fresh-JVM runs per SF, min-combine (NOTES sf10 rule).
set -e
cd /root/repo
Q="dedup_clusters,dedup_apply"
for sf in /root/testdata/sf0.1 /tmp/sf1 /tmp/sf10; do
  tag=$(basename $sf)
  for run in 1 2; do
    out="bench/r15/ccplain_${tag}_${run}.json"
    [ -s "$out" ] && { echo "== $tag run$run: cached"; continue; }
    sbt -batch "set run / envVars := Map(\"SPARK_GRAFT_SF_DIR\" -> \"$sf\", \"SPARK_GRAFT_CPUS\" -> \"32\", \"SPARK_GRAFT_ONLY\" -> \"$Q\", \"SPARK_GRAFT_CC_LOG\" -> \"1\", \"SPARK_GRAFT_BENCH_OUT\" -> \"$out\")" "runMain graft.Bench" 2>&1 | grep -E "dupClusters|metric" > "bench/r15/ccplain_${tag}_${run}.log"
    echo "== $tag run$run: $(grep metric bench/r15/ccplain_${tag}_${run}.log | tail -1)"
  done
done
