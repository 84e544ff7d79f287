#!/bin/bash
# r15 campaign 1: straggler-chain CC gate A/B (VERDICT r14 task 3).
# dedup_clusters_chain on the chain-variant fixtures (/tmp/sf1c,
# /tmp/sf10c — ScaleUp 4th arg injects 128 singleton stratum docs so the
# 96-link path exists; plain ScaleUp corpora have ~4 singletons), plus
# dedup_clusters/dedup_apply for context, pruned vs
# SPARK_GRAFT_CC_NOPRUNE, 2 fresh-JVM runs per cell (min-combine per
# NOTES sf10 rule). CC_LOG on so per-round wall/frontier lands beside
# each run.
set -e
cd /root/repo
Q="dedup_clusters_chain,dedup_clusters,dedup_apply"
for sf in sf1c sf10c; do
  for mode in prune noprune; do
    for run in 1 2; do
      extra=""
      [ "$mode" = noprune ] && extra=', "SPARK_GRAFT_CC_NOPRUNE" -> "1"'
      out="bench/r15/chain_${sf}_${mode}_${run}.json"
      # resumable: a cell that already produced its JSON is done
      [ -s "$out" ] && { echo "== $sf $mode run$run: cached"; continue; }
      sbt -batch "set run / envVars := Map(\"SPARK_GRAFT_SF_DIR\" -> \"/tmp/${sf}\", \"SPARK_GRAFT_CPUS\" -> \"32\", \"SPARK_GRAFT_ONLY\" -> \"$Q\", \"SPARK_GRAFT_CC_LOG\" -> \"1\", \"SPARK_GRAFT_BENCH_OUT\" -> \"$out\"$extra)" "runMain graft.Bench" 2>&1 | grep -E "dupClusters|metric" > "bench/r15/chain_${sf}_${mode}_${run}.log"
      echo "== $sf $mode run$run: $(grep metric bench/r15/chain_${sf}_${mode}_${run}.log | tail -1)"
    done
  done
done
