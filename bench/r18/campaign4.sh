#!/bin/bash
# r18 fixed-4 headline sweeps (the r15 protocol): EXACTLY 4 fresh-JVM
# full-catalog sweeps on the final round tree; per-entry min-combine is
# the round headline (mk_min_combined.py).
set -e
cd /root/repo
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
export SPARK_GRAFT_BENCH_PROFILE=1
unset SPARK_GRAFT_ONLY SPARK_GRAFT_MASTER
for i in 1 2 3 4; do
  sbt -batch "runMain graft.Bench" > /tmp/r18_fix$i.log 2>&1
  cp BENCH_full.json bench/r18/BENCH_full_r18_fix$i.json
  grep -o '"metric":"total","value":[0-9.]*' bench/r18/BENCH_full_r18_fix$i.json || true
done
echo CAMPAIGN4 DONE
