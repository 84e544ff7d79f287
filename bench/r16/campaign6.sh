#!/bin/bash
# r16 campaign 6: rebuild the bounded fixture family under the
# COLLISION-PROOF tag scheme (nonce + "_" terminator — campaign1 caught
# the chained-pass prefix collision: sf3b edges came out 2.4x the
# linear prediction because "c1"+w on a pass-2 copy of an untagged
# pass-1 word equals pass-1's own "c1"-tagged word), then re-run the
# edge census over the family. Linearity gate: each fixture's edge
# count must sit within ~15% of factor x the source's.
set -e
cd /root/repo
rm -rf /tmp/sf1b /tmp/sf3b /tmp/sf10b /tmp/sf30b
rm -f bench/r16/ccmem_sf1b.json bench/r16/ccmem_sf3b.json \
      bench/r16/ccmem_sf10b.json bench/r16/ccmem_sf30b.json
sbt -batch \
  "runMain graft.ScaleUp /root/testdata/sf0.1 /tmp/sf1b 10 bounded" \
  "runMain graft.ScaleUp /tmp/sf1b /tmp/sf3b 3 bounded" \
  "runMain graft.ScaleUp /tmp/sf1b /tmp/sf10b 10 bounded" \
  "runMain graft.ScaleUp /tmp/sf10b /tmp/sf30b 3 bounded" 2>&1 | grep scaleup
export SPARK_DRIVER_MEM=24g
for sf in /tmp/sf1b /tmp/sf3b /tmp/sf10b /tmp/sf30b; do
  tag=$(basename $sf)
  out="bench/r16/ccmem_${tag}.json"
  SPARK_GRAFT_CC_MEM_OUT="$out" SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.CcMemProbe $sf" 2>&1 | grep -E '"metric"' \
    > "bench/r16/ccmem_${tag}.log" || true
  echo "== $tag: $(cat $out 2>/dev/null || echo FAILED)"
done
