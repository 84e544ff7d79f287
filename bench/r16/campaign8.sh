#!/bin/bash
# r16 campaign 8 (NOTES follow-up 2): MEASURED constant-text-length CC
# decade. The chained bounded family stacks one tag layer per pass, so
# text grows 638 -> 1317 B/doc across sf1b..sf30b and the campaign2
# decade exponent (0.70 row-basis) carries a byte-growth confound that
# campaign2 only corrected arithmetically. SINGLE-PASS fixtures at
# factor 30 (/tmp/sf3s, sf3-scale) and factor 300 (/tmp/sf30s,
# sf30-scale) each carry exactly ONE tag layer -> near-constant doc
# length across the decade, measuring the byte-normalized claim
# (0.60/0.57) directly. Census gate first (edges must be ~factor x 508
# and avg strlen ~equal), then the usual 2-fresh-JVM min-combine cells
# at 24g.
set -e
cd /root/repo
if [ ! -d /tmp/sf30s ]; then
  sbt -batch \
    "runMain graft.ScaleUp /root/testdata/sf0.1 /tmp/sf3s 30 bounded" \
    "runMain graft.ScaleUp /root/testdata/sf0.1 /tmp/sf30s 300 bounded" \
    2>&1 | grep scaleup
fi
export SPARK_DRIVER_MEM=24g
for sf in /tmp/sf3s /tmp/sf30s; do
  tag=$(basename $sf)
  out="bench/r16/ccmem_${tag}.json"
  [ -s "$out" ] || SPARK_GRAFT_CC_MEM_OUT="$out" SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.CcMemProbe $sf" 2>&1 | grep -E '"metric"' \
    > "bench/r16/ccmem_${tag}.log" || true
  echo "== census $tag: $(cat $out 2>/dev/null || echo FAILED)"
done
Q="dedup_clusters,dedup_apply"
for sf in /tmp/sf3s /tmp/sf30s; do
  tag=$(basename $sf)
  for run in 1 2; do
    out="bench/r16/ccs_${tag}_${run}.json"
    [ -s "$out" ] && { echo "== $tag run$run: cached"; continue; }
    sbt -batch "set run / envVars := Map(\"SPARK_GRAFT_SF_DIR\" -> \"$sf\", \"SPARK_GRAFT_CPUS\" -> \"32\", \"SPARK_GRAFT_ONLY\" -> \"$Q\", \"SPARK_GRAFT_CC_LOG\" -> \"1\", \"SPARK_GRAFT_BENCH_OUT\" -> \"$out\")" "runMain graft.Bench" 2>&1 | grep -E "dupClusters|metric" > "bench/r16/ccs_${tag}_${run}.log"
    echo "== $tag run$run: $(grep metric bench/r16/ccs_${tag}_${run}.log | tail -1)"
  done
done
