#!/usr/bin/env bash
# Executor-loss fault-tolerance proof for graft.materialize (see
# graft.FaultProof scaladoc and BASELINE.md "Round-14 executor-loss
# proof"): runs the kill-an-executor scenario on a multi-JVM
# local-cluster under both conf values and expects
#   reliable -> serve survives, hashes identical (exit 0)
#   local    -> serve fails with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND (exit 0,
#               the failure IS the expected outcome)
# Usage: tools/faultproof.sh [sfDir]   (default /root/testdata/sf0.01)
set -u
SF="${1:-/root/testdata/sf0.01}"
JAR="target/scala-2.13/mapreduce_codespark_2.13-0.1.0.jar"
[ -f "$JAR" ] || { echo "run 'sbt package' first"; exit 2; }
rc=0
for mode in reliable local; do
  echo "== faultproof mode=$mode =="
  timeout 420 /opt/spark/bin/spark-submit \
    --master 'local-cluster[2,2,2048]' \
    --conf spark.ui.enabled=false \
    --class graft.FaultProof "$JAR" "$mode" "$SF" \
    2>"/tmp/faultproof_$mode.err" | grep '"proof"' || rc=1
done
exit $rc
