#!/bin/bash
# r18 campaign 2 — exponent coverage for the unmeasured heavy tail
# (r17 verdict item 6). Of the top-20 most expensive r17 prod entries,
# three still had family-fallback exponents: dedup_triage_apply (1.28 s,
# cc-dedup), dedup_exact_substr (1.07 s, hash-dedup), ivf_kmeans_topk
# (1.01 s, ann-serving). lm_bigram_logprob, also named by the verdict,
# turned out already measured (0.35, the r13 sf10 decade table).
# dedup_clusters_chain is excluded: it is the pinned-P=32 straggler-regime
# diagnostic probe — its wall is scheduling ticks over ~12 near-empty
# rounds, not data volume, so a data-scale exponent is not meaningful.
#
# Three points per entry: sf0.1 (1x), /tmp/sf1 (10x), /tmp/sf3 (30x) —
# plain suffix-mode fixtures (regen recipe in NOTES). 3 fresh JVMs per
# cell, reps=2 inside each, min-combine offline; LSQ slope over the three
# min-combined points is the quoted exponent. 12g driver heap so the sf3
# cells are not memory-shaped.
set -e
cd /root/repo
export SPARK_DRIVER_MEM=12g
export SPARK_GRAFT_CPUS=32
export SPARK_GRAFT_ONLY=dedup_triage_apply,dedup_exact_substr,ivf_kmeans_topk

for sf in /root/testdata/sf0.1 /tmp/sf1 /tmp/sf3; do
  tag=$(basename $sf)
  for i in 1 2 3; do
    SPARK_GRAFT_SF_DIR=$sf sbt -batch "runMain graft.Bench" \
      > /tmp/r18c2_${tag}_$i.log 2>&1
    cp BENCH_full.json bench/r18/exp_${tag}_$i.json
  done
done
echo CAMPAIGN2 DONE
