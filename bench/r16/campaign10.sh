#!/bin/bash
# r16 campaign 10: hardening reps for numbers quoted in SCALE.md.
#  - dedup_clusters_chain standalone min-of-3 at sf0.1: the fixed-4
#    read 4.80 vs r15's 4.33 (1.11x) and the P-pinned per-round
#    repartition is the one CC code change that plausibly taxes a
#    many-tiny-rounds probe (AQE can no longer coalesce near-empty
#    round frames) — adjudicate code-vs-drift.
#  - second fresh-JVM reps for the governed-posture cells (8g DISK_ONLY
#    16x128 and 12g plain) so the 268/275 s rows are min-combined like
#    every other quoted cell.
set -e
cd /root/repo
for run in 1 2 3; do
  out="bench/r16/chain01_${run}.json"
  [ -s "$out" ] && { echo "== chain run$run: cached"; continue; }
  sbt -batch "set run / envVars := Map(\"SPARK_GRAFT_SF_DIR\" -> \"/root/testdata/sf0.1\", \"SPARK_GRAFT_CPUS\" -> \"32\", \"SPARK_GRAFT_ONLY\" -> \"dedup_clusters_chain\", \"SPARK_GRAFT_BENCH_OUT\" -> \"$out\")" "runMain graft.Bench" 2>&1 | grep -E '"metric"' > /dev/null
  echo "== chain run$run: $(python3 -c "import json;print(json.load(open('$out'))['queries'])")"
done
run_cell() { # heap cpus shufp level tag
  local out="bench/r16/ccgov2_$5_rep2.json"
  [ -s "$out" ] && { echo "== $5 rep2: cached"; return; }
  SPARK_DRIVER_MEM=$1 sbt -batch "set run / envVars := Map(\"SPARK_GRAFT_SF_DIR\" -> \"/tmp/sf30\", \"SPARK_GRAFT_CPUS\" -> \"$2\", \"SPARK_GRAFT_SHUFFLE_PARTITIONS\" -> \"$3\", \"SPARK_GRAFT_ONLY\" -> \"dedup_clusters\", \"SPARK_GRAFT_CC_EDGE_LEVEL\" -> \"$4\", \"SPARK_GRAFT_BENCH_REPS\" -> \"1\", \"SPARK_GRAFT_BENCH_OUT\" -> \"$out\")" "runMain graft.Bench" 2>&1 | grep -E '"metric"' > /dev/null || true
  echo "== $5 rep2: $(cat $out 2>/dev/null || echo 'NO ARTIFACT')"
}
run_cell 8g 16 128 DISK_ONLY 8g_t16_p128_disk
run_cell 12g 32 32 MEMORY_AND_DISK 12g_t32_p32_plain
