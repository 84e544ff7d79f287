#!/bin/bash
set -u
cd /root/repo
echo "=== full test suite ($(date +%H:%M:%S)) ==="
sbt -batch test > bench/r14/logs/test_full.log 2>&1
grep -E "Tests: succeeded|All tests" bench/r14/logs/test_full.log | tail -2

echo "=== verify sf0.001 ($(date +%H:%M:%S)) ==="
sbt -batch "runMain graft.Verify /root/testdata/sf0.001 /tmp/verify_sf0001" > bench/r14/logs/verify_sf0001.log 2>&1
python3 tools/check_oracle.py /root/testdata/sf0.001 /tmp/verify_sf0001 2>&1 | tail -1

echo "=== verify sf0.1 ($(date +%H:%M:%S)) ==="
sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/verify_sf01" > bench/r14/logs/verify_sf01.log 2>&1
python3 tools/check_oracle.py /root/testdata/sf0.1 /tmp/verify_sf01 2>&1 | tail -1

echo "=== full bench run 1 (profiled) ($(date +%H:%M:%S)) ==="
SPARK_GRAFT_BENCH_PROFILE=1 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_OUT=BENCH_full_r14.json \
sbt -batch "runMain graft.Bench" > bench/r14/logs/bench_full_1.log 2>&1
python3 -c "import json; d=json.load(open('BENCH_full_r14.json')); print('total', round(d['value'],1), 'failed', d['failed'])"

echo "=== full bench run 2 (profiled) ($(date +%H:%M:%S)) ==="
SPARK_GRAFT_BENCH_PROFILE=1 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_OUT=bench/r14/BENCH_full_r14_run2.json \
sbt -batch "runMain graft.Bench" > bench/r14/logs/bench_full_2.log 2>&1
python3 -c "import json; d=json.load(open('bench/r14/BENCH_full_r14_run2.json')); print('total', round(d['value'],1), 'failed', d['failed'])"

echo "=== plans dump ($(date +%H:%M:%S)) ==="
sbt -batch "runMain graft.Explain" 2>/dev/null | sed -n '/^======== /,$p' > PLANS_r14.txt
echo "plans: $(grep -c '========' PLANS_r14.txt), cartesian: $(grep -c CartesianProduct PLANS_r14.txt || true)"
echo "=== roundclose done ($(date +%H:%M:%S)) ==="
