#!/bin/bash
# r18 optimization A/B: CC round AQE posture (on / off / sparse) over the
# five CC-family catalog entries, fresh JVM per run, reps=3 per run.
set -e
cd /root/repo
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
export SPARK_GRAFT_ONLY=dedup_clusters_chain,dedup_clusters,dedup_apply,cluster_safe_split,dedup_triage_apply
export SPARK_GRAFT_BENCH_REPS=3
for mode in on off sparse; do
  for run in 1 2; do
    export SPARK_GRAFT_CC_ROUND_AQE=$mode
    export SPARK_GRAFT_BENCH_OUT=bench/r18opt/cc_aqe_${mode}_${run}.json
    sbt -batch "runMain graft.Bench" > /tmp/cc_aqe_${mode}_${run}.log 2>&1
    echo "done $mode $run"
  done
done
echo ALL DONE
