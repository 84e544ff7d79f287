#!/bin/bash
# r14 measurement campaign 1: CC-pruning validation (task 1), ivf2
# adjudication current-tree points (task 2), core-relational four-point
# fits (task 4). Standalone min-of-5 fresh-JVM protocol (legacy
# back-to-back PASSES, no BENCH_REPS) — the protocol SCALE.md r13
# established for cross-SF exponents.
set -u
cd /root/repo
run() {
  local entry=$1 tag=$2 dir=$3
  local out="bench/r14/${entry}_${tag}.json"
  echo "=== $entry $tag ($(date +%H:%M:%S)) ==="
  SPARK_GRAFT_ONLY=$entry SPARK_GRAFT_PASSES=5 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_SF_DIR=$dir SPARK_GRAFT_BENCH_OUT=$out \
  sbt -batch "runMain graft.Bench" \
    > "bench/r14/logs/${entry}_${tag}.log" 2>&1
  tail -c 400 "$out" 2>/dev/null; echo
}

# Phase A: CC edge-pruning validation
for e in dedup_clusters dedup_apply; do
  run $e sf01 /root/testdata/sf0.1
done
for e in dedup_clusters dedup_apply; do
  run $e sf10 /tmp/sf10
done

# Phase B (current tree): ivf2 adjudication points
run cosine_near_dup_ivf2 sf01 /root/testdata/sf0.1
run cosine_near_dup_ivf2 sf1 /tmp/sf1

# Phase C: core relational four-point fits
for e in a1a4_windowed_metrics a1a4_windowed_metrics_capped \
         j2_full_outer_metrics a12_resample_ffill e2_unpivot_measures; do
  run $e sf01 /root/testdata/sf0.1
  run $e sf1 /tmp/sf1
  run $e sf3 /tmp/sf3
  run $e sf10 /tmp/sf10
done
echo "=== campaign1 done ($(date +%H:%M:%S)) ==="
