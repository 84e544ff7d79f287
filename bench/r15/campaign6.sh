#!/bin/bash
# r15 campaign 6: the FIXED-N round-close protocol (VERDICT r14 task 1) —
# exactly 4 fresh-JVM full-catalog sweeps on the final round tree
# (sf0.1, reps=2, warmup sf0.01, PROFILE=1, 8g). The headline
# min-combine is over THESE FOUR runs only; the all-runs best-ever line
# is reported separately in min_combined_r15.json.
set -e
cd /root/repo
for run in 1 2 3 4; do
  out="bench/r15/BENCH_full_r15_fix${run}.json"
  [ -s "$out" ] && { echo "== sweep $run: cached"; continue; }
  sbt -batch "set run / envVars := Map(\"SPARK_GRAFT_SF_DIR\" -> \"/root/testdata/sf0.1\", \"SPARK_GRAFT_CPUS\" -> \"32\", \"SPARK_GRAFT_BENCH_PROFILE\" -> \"1\", \"SPARK_GRAFT_BENCH_OUT\" -> \"$out\")" "runMain graft.Bench" 2>&1 | grep -E '"metric"' > /dev/null
  echo "== sweep $run: total $(python3 -c "import json;print(json.load(open('$out'))['value'])")"
done
