#!/bin/bash
# r15 campaign 4 (verdict item 7 stretch): one bigger fixture for the
# steep families — sf30 (= ScaleUp sf10 x3), two-point sf3 -> sf30 fits
# (100x span centered higher) for CC + semantic dedup. Min-combine of 2
# fresh-JVM runs per cell per the NOTES rule.
set -e
cd /root/repo
Q="dedup_clusters,dedup_apply,semantic_dedup_2level,cosine_near_dup_ivf2"
if [ ! -d /tmp/sf30 ]; then
  sbt -batch "runMain graft.ScaleUp /tmp/sf10 /tmp/sf30 3" 2>&1 | grep scaleup
fi
for sf in /tmp/sf3 /tmp/sf30; do
  tag=$(basename $sf)
  for run in 1 2; do
    out="bench/r15/steep_${tag}_${run}.json"
    [ -s "$out" ] && { echo "== $tag run$run: cached"; continue; }
    sbt -batch "set run / envVars := Map(\"SPARK_GRAFT_SF_DIR\" -> \"$sf\", \"SPARK_GRAFT_CPUS\" -> \"32\", \"SPARK_GRAFT_ONLY\" -> \"$Q\", \"SPARK_GRAFT_BENCH_OUT\" -> \"$out\")" "runMain graft.Bench" 2>&1 | grep -E "metric" > "bench/r15/steep_${tag}_${run}.log"
    echo "== $tag run$run: $(grep metric bench/r15/steep_${tag}_${run}.log | tail -1)"
  done
done
