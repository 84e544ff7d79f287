#!/bin/bash
# r17 campaign 1 (verdict item 3): CONSTANT-LENGTH bounded CC decade.
# The r16 single-pass prefix fixtures (sf3s/sf30s) still grew text
# +17% across the decade (the factor-300 tag is two chars longer), so
# the byte-normalized column stayed arithmetic. ScaleUp's new
# `boundedconst` mode replaces EVERY word in EVERY copy (incl. copy 0)
# with the fixed-width base-36 encoding of (copy*V + rank) — an exact
# word bijection, cross-copy-disjoint, 4 bytes/word regardless of
# factor or copy index — so fixture bytes scale EXACTLY linearly with
# rows and the measured row-basis exponent IS the byte-basis exponent.
# Family: /tmp/sf1k (x10), /tmp/sf3k (x30), /tmp/sf30k (x300), all
# single-pass from sf0.1. Census gate first (edges ~ factor x 508 AND
# avg text bytes equal across the family), then 2-fresh-JVM
# min-combine cells for dedup_clusters/dedup_apply at 24g.
set -e
cd /root/repo
if [ ! -d /tmp/sf30k ]; then
  sbt -batch \
    "runMain graft.ScaleUp /root/testdata/sf0.1 /tmp/sf1k 10 boundedconst" \
    "runMain graft.ScaleUp /root/testdata/sf0.1 /tmp/sf3k 30 boundedconst" \
    "runMain graft.ScaleUp /root/testdata/sf0.1 /tmp/sf30k 300 boundedconst" \
    2>&1 | grep scaleup
fi
python3 - <<'EOF'
import duckdb, glob
for sf in ["/tmp/sf1k", "/tmp/sf3k", "/tmp/sf30k"]:
    g = f"{sf}/documents.parquet/*.parquet"
    n, b = duckdb.sql(
        f"SELECT count(*), avg(strlen(text)) FROM read_parquet('{g}')"
    ).fetchall()[0]
    print(f"[census] {sf}: {n} docs, avg {b:.2f} B/doc")
EOF
export SPARK_DRIVER_MEM=24g
for sf in /tmp/sf1k /tmp/sf3k /tmp/sf30k; do
  tag=$(basename $sf)
  out="bench/r17/ccmem_${tag}.json"
  [ -s "$out" ] || SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.CcMemProbe $sf $out" 2>&1 | grep -E '"metric"' \
    > "bench/r17/ccmem_${tag}.log" || true
  echo "== census $tag: $(cat $out 2>/dev/null || echo FAILED)"
done
Q="dedup_clusters,dedup_apply"
for sf in /tmp/sf1k /tmp/sf3k /tmp/sf30k; do
  tag=$(basename $sf)
  for run in 1 2; do
    out="bench/r17/cck_${tag}_${run}.json"
    [ -s "$out" ] && { echo "== $tag run$run: cached"; continue; }
    sbt -batch "set run / envVars := Map(\"SPARK_GRAFT_SF_DIR\" -> \"$sf\", \"SPARK_GRAFT_CPUS\" -> \"32\", \"SPARK_GRAFT_ONLY\" -> \"$Q\", \"SPARK_GRAFT_CC_LOG\" -> \"1\", \"SPARK_GRAFT_BENCH_OUT\" -> \"$out\")" "runMain graft.Bench" 2>&1 | grep -E "dupClusters|metric" > "bench/r17/cck_${tag}_${run}.log"
    echo "== $tag run$run: $(grep metric bench/r17/cck_${tag}_${run}.log | tail -1)"
  done
done
echo "campaign1 done"
