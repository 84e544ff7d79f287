#!/bin/bash
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
  tail -c 300 "$out" 2>/dev/null; echo
}
for e in j5_asof_join j6_range_join o2_topk_per_group u3_cube_orders \
         psi_drift approx_tdigest_quantiles; do
  run $e sf01 /root/testdata/sf0.1
  run $e sf10 /tmp/sf10
done
echo "=== campaign5 done ($(date +%H:%M:%S)) ==="
