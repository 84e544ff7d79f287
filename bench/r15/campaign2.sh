#!/bin/bash
# r15 campaign 2: CC shuffle-layout rework (VERDICT r14 task 4) —
# hash(dst)-partitioned edge cache + shuffle_hash small sides +
# doc_id-partitioning-preserving checkpoints. Same cells as campaign1's
# prune arm (sf1c + sf10c, CC_LOG, 2 fresh-JVM runs); campaign1 JSONs
# are the before, these the after.
set -e
cd /root/repo
Q="dedup_clusters_chain,dedup_clusters,dedup_apply"
for sf in sf1c sf10c; do
  for run in 1 2; do
    out="bench/r15/ccpart_${sf}_${run}.json"
    [ -s "$out" ] && { echo "== $sf run$run: cached"; continue; }
    sbt -batch "set run / envVars := Map(\"SPARK_GRAFT_SF_DIR\" -> \"/tmp/${sf}\", \"SPARK_GRAFT_CPUS\" -> \"32\", \"SPARK_GRAFT_ONLY\" -> \"$Q\", \"SPARK_GRAFT_CC_LOG\" -> \"1\", \"SPARK_GRAFT_BENCH_OUT\" -> \"$out\")" "runMain graft.Bench" 2>&1 | grep -E "dupClusters|metric" > "bench/r15/ccpart_${sf}_${run}.log"
    echo "== $sf run$run: $(grep metric bench/r15/ccpart_${sf}_${run}.log | tail -1)"
  done
done
