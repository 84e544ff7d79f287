#!/bin/bash
# r17 campaign 1b: third fresh-JVM run per constant-length CC cell —
# campaign1's two-run min-combine left 15-33% run spread on the sf1k
# apply and sf30k clusters cells, too wide for a catalog-facing decade
# fit; a third run tightens the per-cell min before the exponents are
# recorded.
set -e
cd /root/repo
export SPARK_DRIVER_MEM=24g
Q="dedup_clusters,dedup_apply"
for sf in /tmp/sf1k /tmp/sf3k /tmp/sf30k; do
  tag=$(basename $sf)
  for run in 3; do
    out="bench/r17/cck_${tag}_${run}.json"
    [ -s "$out" ] && { echo "== $tag run$run: cached"; continue; }
    sbt -batch "set run / envVars := Map(\"SPARK_GRAFT_SF_DIR\" -> \"$sf\", \"SPARK_GRAFT_CPUS\" -> \"32\", \"SPARK_GRAFT_ONLY\" -> \"$Q\", \"SPARK_GRAFT_CC_LOG\" -> \"1\", \"SPARK_GRAFT_BENCH_OUT\" -> \"$out\")" "runMain graft.Bench" 2>&1 | grep -E "dupClusters|metric" > "bench/r17/cck_${tag}_${run}.log"
    echo "== $tag run$run: $(grep metric bench/r17/cck_${tag}_${run}.log | tail -1)"
  done
done
echo "campaign1b done"
