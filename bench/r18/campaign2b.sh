#!/bin/bash
# r18 campaign 2b — honest-fixture re-measure of the two dup-structure-
# dependent entries from campaign 2. On PLAIN suffix fixtures cross-copy
# banding grows candidate-pair sets / span-group sizes quadratically with
# the factor (the r15 CC fixture artifact), so campaign 2's near-linear
# top decades (triage 0.97, substr 0.93) are upper bounds that conflate
# operator cost with fixture dup growth. The boundedconst fixtures
# (/tmp/sf1k, /tmp/sf3k: per-copy word bijection, constant 4 B tokens)
# hold the dup profile EXACTLY at the source's per copy — rows AND bytes
# scale linearly, dup structure does not grow — so these cells measure
# the operator. Base point sf0.1 is shared with campaign 2.
set -e
cd /root/repo
export SPARK_DRIVER_MEM=12g
export SPARK_GRAFT_CPUS=32
export SPARK_GRAFT_ONLY=dedup_triage_apply,dedup_exact_substr

for sf in /tmp/sf1k /tmp/sf3k; do
  tag=$(basename $sf)
  for i in 1 2 3; do
    SPARK_GRAFT_SF_DIR=$sf sbt -batch "runMain graft.Bench" \
      > /tmp/r18c2b_${tag}_$i.log 2>&1
    cp BENCH_full.json bench/r18/exp_${tag}_$i.json
  done
done
echo CAMPAIGN2B DONE
