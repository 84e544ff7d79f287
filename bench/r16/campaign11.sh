#!/bin/bash
# r16 campaign 11: the FIXED-4 sweeps re-run on the FINAL round tree —
# campaign7's four ran before the (semantics-neutral) deprecation
# cleanup commits; the protocol pins the headline to the final tree, so
# THESE four are the r16 fixed-4 and campaign7's feed the best-ever
# line only. Same protocol: fresh JVM, sf0.1, reps=2, warmup sf0.01,
# PROFILE=1, 8g.
set -e
cd /root/repo
for run in 5 6 7 8; do
  out="bench/r16/BENCH_full_r16_fix${run}.json"
  [ -s "$out" ] && { echo "== sweep $run: cached"; continue; }
  sbt -batch "set run / envVars := Map(\"SPARK_GRAFT_SF_DIR\" -> \"/root/testdata/sf0.1\", \"SPARK_GRAFT_CPUS\" -> \"32\", \"SPARK_GRAFT_BENCH_PROFILE\" -> \"1\", \"SPARK_GRAFT_BENCH_OUT\" -> \"$out\")" "runMain graft.Bench" 2>&1 | grep -E '"metric"' > /dev/null
  echo "== sweep $run: total $(python3 -c "import json;d=json.load(open('$out'));print(d['value'],'prod',d['value_prod'])")"
done
