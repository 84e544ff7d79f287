#!/bin/bash
# r16 campaign 3 (VERDICT r15 item 4): memory-GOVERNED posture on the
# quadratic-fixture stress — the ~450M-row sf30 edge cache that OOMs
# the default 8g MEMORY_AND_DISK posture (r15 campaign4). The committed
# evidence wanted: a capped-heap run that COMPLETES (spill, not OOM),
# using the SPARK_GRAFT_CC_EDGE_LEVEL knob to keep the O(E) cache out
# of the on-heap storage pool. One run per level (completion evidence;
# 24g timings stay the r15 numbers).
set -e
cd /root/repo
export SPARK_DRIVER_MEM=8g
for level in DISK_ONLY MEMORY_AND_DISK_SER; do
  out="bench/r16/ccgov_sf30_${level}.json"
  [ -s "$out" ] && { echo "== $level: cached"; continue; }
  sbt -batch "set run / envVars := Map(\"SPARK_GRAFT_SF_DIR\" -> \"/tmp/sf30\", \"SPARK_GRAFT_CPUS\" -> \"32\", \"SPARK_GRAFT_ONLY\" -> \"dedup_clusters\", \"SPARK_GRAFT_CC_LOG\" -> \"1\", \"SPARK_GRAFT_CC_EDGE_LEVEL\" -> \"$level\", \"SPARK_GRAFT_BENCH_REPS\" -> \"1\", \"SPARK_GRAFT_BENCH_OUT\" -> \"$out\")" "runMain graft.Bench" 2>&1 | grep -E "dupClusters|metric|OutOfMemory" > "bench/r16/ccgov_sf30_${level}.log" || true
  echo "== $level: $(cat $out 2>/dev/null || echo 'NO ARTIFACT (see log)')"
done
