#!/bin/bash
# r15 stream-latency artifact: reference 30 s trigger, uniform vs stress
# (burst/skew/late) shapes at 50k and 500k rows/s sustained.
set -e
cd /root/repo
for shape in uniform stress; do
  out="bench/r15/streamlat_${shape}.json"
  [ -s "$out" ] && { echo "== $shape cached"; continue; }
  sbt -batch "set run / envVars := Map(\"SPARK_GRAFT_CPUS\" -> \"32\", \"SPARK_GRAFT_STREAM_LAT_OUT\" -> \"$out\")" "runMain graft.StreamLatency 50000,500000 30 6 $shape" 2>&1 | grep -E "streamlat|stream_batch" > "bench/r15/streamlat_${shape}.log"
  echo "== $shape: $(cat $out)"
done
jq -s '.' bench/r15/streamlat_uniform.json bench/r15/streamlat_stress.json > bench/STREAM_LATENCY_r15.json 2>/dev/null || cat bench/r15/streamlat_uniform.json bench/r15/streamlat_stress.json > bench/STREAM_LATENCY_r15.json
echo merged
