#!/bin/bash
# r16 campaign 2 (VERDICT r15 item 2): CC cells on the BOUNDED-clique
# fixture family — copies are word-bijected so they never band with
# their originals; campaign1 certifies the edge count grows ~linearly
# with the factor. Four-point bounded fit sf1b -> sf3b -> sf10b -> sf30b
# (the big decade sf3b -> sf30b is the slope the r15 verdict asked for).
# 24g heap (same memory posture as the r15 sf30 cells so the decades
# compare like-for-like); min-combine of 2 fresh-JVM runs per cell.
set -e
cd /root/repo
Q="dedup_clusters,dedup_apply"
export SPARK_DRIVER_MEM=24g
for sf in /tmp/sf1b /tmp/sf3b /tmp/sf10b /tmp/sf30b; do
  tag=$(basename $sf)
  for run in 1 2; do
    out="bench/r16/ccb_${tag}_${run}.json"
    [ -s "$out" ] && { echo "== $tag run$run: cached"; continue; }
    sbt -batch "set run / envVars := Map(\"SPARK_GRAFT_SF_DIR\" -> \"$sf\", \"SPARK_GRAFT_CPUS\" -> \"32\", \"SPARK_GRAFT_ONLY\" -> \"$Q\", \"SPARK_GRAFT_CC_LOG\" -> \"1\", \"SPARK_GRAFT_BENCH_OUT\" -> \"$out\")" "runMain graft.Bench" 2>&1 | grep -E "dupClusters|metric" > "bench/r16/ccb_${tag}_${run}.log"
    echo "== $tag run$run: $(grep metric bench/r16/ccb_${tag}_${run}.log | tail -1)"
  done
done
