#!/bin/bash
# r16 campaign 5 (VERDICT r15 item 4, after campaign3's finding): the 8g
# OOM on the quadratic sf30 fixture is NOT only the edge cache —
# MEMORY_AND_DISK_SER still died in the 468M-pair generation stage
# (campaign3 log), so the cache level alone cannot save an 8g heap when
# 32 concurrent tasks each chew ~15M edges. The governed posture adds
# the second lever a capped-heap deployment turns: fewer concurrent
# tasks over more, smaller shuffle partitions (threads 16, partitions
# 128 -> ~3.7M edges per task, 16 resident at once = ~1/8 the peak of
# the 32x32 layout) + DISK_ONLY edge cache. Escalation arm at 12g
# records the minimal plain-posture heap if the 8g governed run still
# dies. One run per cell (completion evidence).
set -e
cd /root/repo
run_cell() { # heap cpus shufp level tag
  local out="bench/r16/ccgov2_$5.json"
  [ -s "$out" ] && { echo "== $5: cached"; return; }
  SPARK_DRIVER_MEM=$1 sbt -batch "set run / envVars := Map(\"SPARK_GRAFT_SF_DIR\" -> \"/tmp/sf30\", \"SPARK_GRAFT_CPUS\" -> \"$2\", \"SPARK_GRAFT_SHUFFLE_PARTITIONS\" -> \"$3\", \"SPARK_GRAFT_ONLY\" -> \"dedup_clusters\", \"SPARK_GRAFT_CC_LOG\" -> \"1\", \"SPARK_GRAFT_CC_EDGE_LEVEL\" -> \"$4\", \"SPARK_GRAFT_BENCH_REPS\" -> \"1\", \"SPARK_GRAFT_BENCH_OUT\" -> \"$out\")" "runMain graft.Bench" 2>&1 | grep -E "dupClusters|metric|OutOfMemory" | head -40 > "bench/r16/ccgov2_$5.log" || true
  echo "== $5: $(cat $out 2>/dev/null || echo 'NO ARTIFACT (see log)')"
}
run_cell 8g 16 128 DISK_ONLY 8g_t16_p128_disk
run_cell 12g 32 32 MEMORY_AND_DISK 12g_t32_p32_plain
