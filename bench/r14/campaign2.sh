#!/bin/bash
# r14 campaign 2: shuffle-free-probe CC re-measure + CC round telemetry,
# retrieval family two-point fits, pre-r13 ivf2 adjudication leg.
set -u
cd /root/repo
run() {
  local entry=$1 tag=$2 dir=$3 extra_env=${4:-}
  local out="bench/r14/${entry}_${tag}.json"
  echo "=== $entry $tag ($(date +%H:%M:%S)) ==="
  env $extra_env SPARK_GRAFT_ONLY=$entry SPARK_GRAFT_PASSES=5 \
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=$dir SPARK_GRAFT_BENCH_OUT=$out \
  sbt -batch "runMain graft.Bench" \
    > "bench/r14/logs/${entry}_${tag}.log" 2>&1
  tail -c 400 "$out" 2>/dev/null; echo
}

sbt -batch compile > bench/r14/logs/compile2.log 2>&1 || { echo "COMPILE FAILED"; exit 1; }

# CC round telemetry: one pass, stderr telemetry into the log
echo "=== cc_log diagnostic sf10 ($(date +%H:%M:%S)) ==="
SPARK_GRAFT_CC_LOG=1 SPARK_GRAFT_ONLY=dedup_apply SPARK_GRAFT_PASSES=1 \
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/tmp/sf10 \
SPARK_GRAFT_BENCH_OUT=bench/r14/cc_diag_sf10.json \
sbt -batch "runMain graft.Bench" > bench/r14/logs/cc_diag_sf10.log 2>&1
grep "dupClusters" bench/r14/logs/cc_diag_sf10.log

# CC re-measure with the shuffle-free probe
run dedup_clusters v2sf01 /root/testdata/sf0.1
run dedup_apply    v2sf01 /root/testdata/sf0.1
run dedup_clusters v2sf10 /tmp/sf10
run dedup_apply    v2sf10 /tmp/sf10

# one-scan capped twin re-measure (MinKAgg form)
run a1a4_windowed_metrics_capped v2sf01 /root/testdata/sf0.1
run a1a4_windowed_metrics_capped v2sf1  /tmp/sf1
run a1a4_windowed_metrics_capped v2sf3  /tmp/sf3
run a1a4_windowed_metrics_capped v2sf10 /tmp/sf10

# retrieval family two-point fits (fills the catalog family fallback)
run bm25_topk  sf01 /root/testdata/sf0.1
run bm25_topk  sf10 /tmp/sf10
run hybrid_rrf sf01 /root/testdata/sf0.1
run hybrid_rrf sf10 /tmp/sf10

# pre-r13 leg: ivf2 on the r12-final tree, same protocol
cd /tmp/prer13
sbt -batch compile > /root/repo/bench/r14/logs/prer13_compile.log 2>&1 || { echo "PRER13 COMPILE FAILED"; exit 1; }
for sf in "sf01 /root/testdata/sf0.1" "sf1 /tmp/sf1"; do
  set -- $sf
  echo "=== prer13 cosine_near_dup_ivf2 $1 ($(date +%H:%M:%S)) ==="
  SPARK_GRAFT_ONLY=cosine_near_dup_ivf2 SPARK_GRAFT_PASSES=5 \
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=$2 \
  SPARK_GRAFT_BENCH_OUT=/root/repo/bench/r14/prer13_ivf2_$1.json \
  sbt -batch "runMain graft.Bench" \
    > /root/repo/bench/r14/logs/prer13_ivf2_$1.log 2>&1
  tail -c 300 /root/repo/bench/r14/prer13_ivf2_$1.json 2>/dev/null; echo
done
# current-tree ivf2 sf1 point (sf0.1 already in campaign1)
cd /root/repo
run cosine_near_dup_ivf2 sf1 /tmp/sf1
echo "=== campaign2 done ($(date +%H:%M:%S)) ==="
