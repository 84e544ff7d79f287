#!/bin/bash
# r14 measurement campaign 6 (fresh-host session): final-tree artifacts.
#  Phase A: full-catalog bench pair (PROFILE=1, reps=2 cross-sweep) on the
#    151-entry catalog — the r14-close pair was measured on a visibly
#    slower host session (SCALE.md §r14 variance); this pair replaces it
#    if faster under the same protocol.
#  Phase B: four-point standalone min-of-5 fits for the new bounded-buffer
#    twins vs their uncapped entries (a5 / a14 families).
set -u
cd /root/repo
mkdir -p bench/r14/logs

run_full() {
  local tag=$1
  local out="bench/r14/BENCH_full_r14_${tag}.json"
  echo "=== full $tag ($(date +%H:%M:%S)) ==="
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_BENCH_PROFILE=1 SPARK_GRAFT_BENCH_OUT=$out \
  sbt -batch "runMain graft.Bench" \
    > "bench/r14/logs/full_${tag}.log" 2>&1
  tail -c 300 "$out" 2>/dev/null; echo
}

run_one() {
  local entry=$1 tag=$2 dir=$3
  local out="bench/r14/${entry}_${tag}.json"
  echo "=== $entry $tag ($(date +%H:%M:%S)) ==="
  SPARK_GRAFT_ONLY=$entry SPARK_GRAFT_PASSES=5 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_SF_DIR=$dir SPARK_GRAFT_BENCH_OUT=$out \
  sbt -batch "runMain graft.Bench" \
    > "bench/r14/logs/${entry}_${tag}.log" 2>&1
  tail -c 300 "$out" 2>/dev/null; echo
}

# Phase A: full-catalog pair
run_full fresh1
run_full fresh2

# Phase B: capped-twin four-point fits
for e in a5_collect_series a5_collect_series_capped \
         a14_group_concat a14_group_concat_capped; do
  run_one $e sf01 /root/testdata/sf0.1
  run_one $e sf1 /tmp/sf1
  run_one $e sf3 /tmp/sf3
  run_one $e sf10 /tmp/sf10
done
echo "=== campaign6 done ($(date +%H:%M:%S)) ==="
