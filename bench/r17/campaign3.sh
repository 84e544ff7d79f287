#!/bin/bash
# r17 campaign 3: the FIXED-4 headline sweeps on the final r17 tree
# (protocol pinned in r15: per-entry min-combine over EXACTLY 4
# fresh-JVM full-catalog runs; fresh JVM, sf0.1, reps=2, warmup sf0.01,
# PROFILE=1, 8g). The only catalog-entry code change this round is the
# a5_collect_series_capped_typed post-aggregation string rendering.
set -e
cd /root/repo
for run in 1 2 3 4; do
  out="bench/r17/BENCH_full_r17_fix${run}.json"
  [ -s "$out" ] && { echo "== sweep $run: cached"; continue; }
  sbt -batch "set run / envVars := Map(\"SPARK_GRAFT_SF_DIR\" -> \"/root/testdata/sf0.1\", \"SPARK_GRAFT_CPUS\" -> \"32\", \"SPARK_GRAFT_BENCH_PROFILE\" -> \"1\", \"SPARK_GRAFT_BENCH_OUT\" -> \"$out\")" "runMain graft.Bench" 2>&1 | grep -E '"metric"' > /dev/null
  echo "== sweep $run: total $(python3 -c "import json;d=json.load(open('$out'));print(d['value'],'prod',d['value_prod'])")"
done
echo "campaign3 done"
