#!/bin/bash
# r16 campaign 7: the FIXED-4 round-close protocol (r15 convention) —
# exactly 4 fresh-JVM full-catalog sweeps on the final round tree
# (sf0.1, reps=2, warmup sf0.01, PROFILE=1, 8g). The headline
# min-combine is over THESE FOUR runs only; Bench now also emits the
# prod-posture subtotal (value_prod/n_prod — r15 verdict item 5).
# Plus the item-7 stretch: sf1 refresh cells for the two ml-envelope
# entries (x8_tfidf_ridge, x_perm_importance) in their CURRENT form —
# the r9 fused-form fits (0.21/0.07) predate several rounds of tree
# drift.
set -e
cd /root/repo
for run in 1 2 3 4; do
  out="bench/r16/BENCH_full_r16_fix${run}.json"
  [ -s "$out" ] && { echo "== sweep $run: cached"; continue; }
  sbt -batch "set run / envVars := Map(\"SPARK_GRAFT_SF_DIR\" -> \"/root/testdata/sf0.1\", \"SPARK_GRAFT_CPUS\" -> \"32\", \"SPARK_GRAFT_BENCH_PROFILE\" -> \"1\", \"SPARK_GRAFT_BENCH_OUT\" -> \"$out\")" "runMain graft.Bench" 2>&1 | grep -E '"metric"' > /dev/null
  echo "== sweep $run: total $(python3 -c "import json;d=json.load(open('$out'));print(d['value'],'prod',d['value_prod'])")"
done
Q="x8_tfidf_ridge,x_perm_importance"
for sf in /root/testdata/sf0.1 /tmp/sf1; do
  tag=$(basename $sf)
  for run in 1 2; do
    out="bench/r16/ml_${tag}_${run}.json"
    [ -s "$out" ] && { echo "== ml $tag run$run: cached"; continue; }
    sbt -batch "set run / envVars := Map(\"SPARK_GRAFT_SF_DIR\" -> \"$sf\", \"SPARK_GRAFT_CPUS\" -> \"32\", \"SPARK_GRAFT_ONLY\" -> \"$Q\", \"SPARK_GRAFT_BENCH_OUT\" -> \"$out\")" "runMain graft.Bench" 2>&1 | grep -E '"metric"' > /dev/null
    echo "== ml $tag run$run: $(python3 -c "import json;print(json.load(open('$out'))['queries'])")"
  done
done
