#!/bin/bash
set -u
cd /root/repo
echo "=== plans dump v2 ($(date +%H:%M:%S)) ==="
sbt -batch "runMain graft.Explain" 2>/dev/null | sed -e 's/^\[info\] //' | sed -n '/^======== /,$p' | grep -v '^\[success\]' > PLANS_r14.txt
echo "plans: $(grep -c '========' PLANS_r14.txt), cartesian: $(grep -c CartesianProduct PLANS_r14.txt || true), bnlj: $(grep -c BroadcastNestedLoopJoin PLANS_r14.txt || true)"

echo "=== full bench run 3 (16g heap) ($(date +%H:%M:%S)) ==="
SPARK_DRIVER_MEM=16g SPARK_GRAFT_BENCH_PROFILE=1 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_OUT=bench/r14/BENCH_full_r14_run3_16g.json \
sbt -batch "runMain graft.Bench" > bench/r14/logs/bench_full_3.log 2>&1
python3 -c "import json; d=json.load(open('bench/r14/BENCH_full_r14_run3_16g.json')); print('total', round(d['value'],1), 'failed', d['failed'], 'spread_med', round(d['spread_med'],3))"
echo "=== post done ($(date +%H:%M:%S)) ==="
