#!/bin/bash
# continuation of campaign3 (rerun after the r18 ENOSPC lesson: stale
# graft_streamlat checkpoint scratch from r17 + crashed runs had filled
# /tmp; StreamLatency now removes its scratch via shutdown hook, and the
# rm between runs backstops the hard-abort path). Tolerates the known
# RocksDB JNI teardown SIGSEGV: results are written before teardown, so
# gate on the artifact, not the exit code.
cd /root/repo
export SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13
export SPARK_WORKER_DIR=/tmp/spark-worker
export SPARK_GRAFT_CPUS=32
run() { # out_file master idx
  SPARK_GRAFT_MASTER="$2" SPARK_GRAFT_STREAM_LAT_OUT="$1" \
    sbt -batch "runMain graft.StreamLatency 200000 30 6 uniform rocksdb 4000000" \
    > /tmp/r18c3_$3.log 2>&1 || true
  rm -rf /tmp/graft_streamlat* /tmp/spark-[0-9a-f]*
  [ -s "$1" ] && echo "OK $1" || echo "MISSING $1"
}
run bench/r18/streamlat_local32_2.json "local[32]" local32_2
run bench/r18/streamlat_lc4x8x6g_1.json "local-cluster[4,8,6144]" lc6g_1
run bench/r18/streamlat_lc4x8x6g_2.json "local-cluster[4,8,6144]" lc6g_2
echo CAMPAIGN3B2 DONE
