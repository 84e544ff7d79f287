#!/bin/bash
# r16 campaign 1: CC edge-cache census (VERDICT r15 items 2+4 groundwork).
# graft.CcMemProbe materializes exactly the dupClusters edge cache per
# fixture and reports edge rows + cached bytes:
#  - BOUNDED family (sf1b/sf3b/sf10b/sf30b, ScaleUp `bounded` word
#    bijection): edge rows should grow ~LINEARLY with the factor — the
#    honest-fixture precondition for the item-2 CC decade;
#  - QUADRATIC family (sf1/sf10/sf30, legacy suffix-token copies): the
#    r15 fixture-artifact slope, kept for contrast;
#  - bytes/edge is the measured constant for the SCALE.md memory-sizing
#    rule (E x bytes/edge vs storage-pool budget).
# 24g heap so the sf30 cells hold their caches without spill skewing
# memSize; one run per cell (byte sizes, not timings).
set -e
cd /root/repo
export SPARK_DRIVER_MEM=24g
for sf in /root/testdata/sf0.1 /tmp/sf1b /tmp/sf3b /tmp/sf10b /tmp/sf30b /tmp/sf1 /tmp/sf10 /tmp/sf30; do
  tag=$(basename $sf)
  out="bench/r16/ccmem_${tag}.json"
  [ -s "$out" ] && { echo "== $tag: cached"; continue; }
  SPARK_GRAFT_CC_MEM_OUT="$out" SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.CcMemProbe $sf" 2>&1 | grep -E '"metric"' \
    > "bench/r16/ccmem_${tag}.log" || true
  echo "== $tag: $(cat $out 2>/dev/null || echo FAILED)"
done
