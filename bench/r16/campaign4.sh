#!/bin/bash
# r16 campaign 4 (VERDICT r15 item 3): streaming latency with state
# LARGER THAN THE HEAP, RocksDB vs the default HDFS-backed provider.
#
# Sizing, second attempt: the first cut (2g heap, 32 threads, 500k
# rows/s) OOM'd in shuffle EXECUTION (stage task heap, not state) —
# 15M-row batches on a 2g/32-thread heap starve the execution pool
# before the state store matters, so it measured nothing about the
# provider. This cut gives execution room but keeps state oversized:
# 4g heap, 16 threads, 200k rows/s (6M-row batches), keyCard=4,000,000
# (state rows ~= live (window, key, side) combos ~ tens of millions —
# r15's cells held 180k rows ~18 per key at card 10k). HDFS keeps that
# on heap (expected to die or crawl: the CONTRAST arm, outcome
# recorded either way); RocksDB holds it in native memtables + SST
# files (the posture StreamingEventDedup's scaladoc prescribes) and
# must complete with bounded p95 at the 30 s trigger.
set -e
cd /root/repo
export SPARK_DRIVER_MEM=4g
export SPARK_GRAFT_CPUS=16
for shape in uniform stress; do
  for prov in rocksdb hdfs; do
    out="bench/r16/streamlat_${shape}_${prov}.json"
    [ -s "$out" ] && { echo "== $shape/$prov: cached"; continue; }
    SPARK_GRAFT_STREAM_LAT_OUT="$out" \
      sbt -batch "runMain graft.StreamLatency 200000 30 6 $shape $prov 4000000" 2>&1 | grep -E "streamlat|OutOfMemory|Exception" | head -20 > "bench/r16/streamlat_${shape}_${prov}.log" || true
    echo "== $shape/$prov: $(cat $out 2>/dev/null || echo 'NO ARTIFACT (see log)')"
  done
done
