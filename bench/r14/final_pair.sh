#!/bin/bash
set -u
cd /root/repo
echo "=== final bench run A (new default warmup) ($(date +%H:%M:%S)) ==="
SPARK_GRAFT_BENCH_PROFILE=1 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_OUT=BENCH_full_r14.json \
sbt -batch "runMain graft.Bench" > bench/r14/logs/bench_final_A.log 2>&1
python3 -c "import json; d=json.load(open('BENCH_full_r14.json')); print('total', round(d['value'],1), 'spread_med', round(d['spread_med'],3))"
echo "=== final bench run B ($(date +%H:%M:%S)) ==="
SPARK_GRAFT_BENCH_PROFILE=1 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_OUT=bench/r14/BENCH_full_r14_runB.json \
sbt -batch "runMain graft.Bench" > bench/r14/logs/bench_final_B.log 2>&1
python3 -c "import json; d=json.load(open('bench/r14/BENCH_full_r14_runB.json')); print('total', round(d['value'],1), 'spread_med', round(d['spread_med'],3))"
echo "=== verify sf0.01 regate ($(date +%H:%M:%S)) ==="
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_sf001" > bench/r14/logs/verify_regate.log 2>&1
python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_sf001 2>&1 | tail -1
echo "=== final pair done ($(date +%H:%M:%S)) ==="
