#!/bin/bash
set -u
cd /root/repo
sbt -batch compile > bench/r14/logs/compile3.log 2>&1 || { echo "COMPILE FAILED"; exit 1; }

echo "=== cc_log diag v3 sf10 ($(date +%H:%M:%S)) ==="
SPARK_GRAFT_CC_LOG=1 SPARK_GRAFT_ONLY=dedup_apply SPARK_GRAFT_PASSES=1 \
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/tmp/sf10 \
SPARK_GRAFT_BENCH_OUT=bench/r14/cc_diag_v3_sf10.json \
sbt -batch "runMain graft.Bench" > bench/r14/logs/cc_diag_v3_sf10.log 2>&1
grep "dupClusters" bench/r14/logs/cc_diag_v3_sf10.log

run() {
  local entry=$1 tag=$2 dir=$3
  local out="bench/r14/${entry}_${tag}.json"
  echo "=== $entry $tag ($(date +%H:%M:%S)) ==="
  SPARK_GRAFT_ONLY=$entry SPARK_GRAFT_PASSES=5 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_SF_DIR=$dir SPARK_GRAFT_BENCH_OUT=$out \
  sbt -batch "runMain graft.Bench" \
    > "bench/r14/logs/${entry}_${tag}.log" 2>&1
  tail -c 300 "$out" 2>/dev/null; echo
}
run dedup_clusters v3sf01 /root/testdata/sf0.1
run dedup_apply    v3sf01 /root/testdata/sf0.1
run dedup_clusters v3sf10 /tmp/sf10
run dedup_apply    v3sf10 /tmp/sf10

echo "=== stream latency ($(date +%H:%M:%S)) ==="
SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_STREAM_LAT_OUT=bench/STREAM_LATENCY_r14.json \
sbt -batch "runMain graft.StreamLatency 50000,500000 30 6" \
  > bench/r14/logs/stream_latency.log 2>&1
cat bench/STREAM_LATENCY_r14.json 2>/dev/null
echo "=== campaign3 done ($(date +%H:%M:%S)) ==="
