#!/usr/bin/env bash
# Streaming executor-loss fault-tolerance proof (see graft.FaultProofStream
# scaladoc and BASELINE.md "Round-15 streaming executor-loss proof"):
# runs the kill-an-executor-mid-stream sessionizer scenario on a
# multi-JVM local-cluster under both state-store providers and expects
# BOTH to recover from the checkpoint location with rows identical to
# an un-killed control run (every streaming provider persists state to
# the checkpointLocation — the proof demonstrates the recovery path,
# including RocksDB's changelog/snapshot restore, actually works).
# Usage: tools/faultproof_stream.sh    (no data dir needed - synthetic feed)
set -u
JAR="target/scala-2.13/mapreduce_codespark_2.13-0.1.0.jar"
[ -f "$JAR" ] || { echo "run 'sbt package' first"; exit 2; }
rc=0
for mode in rocksdb hdfs; do
  echo "== faultproof_stream mode=$mode =="
  # capture, don't pipe: a pipeline's status is the LAST command's —
  # gate on FaultProofStream's own exit code AND the expected_outcome
  # field (the r14 faultproof.sh advice fix, applied from birth here)
  out=$(timeout 600 /opt/spark/bin/spark-submit \
    --master 'local-cluster[2,2,2048]' \
    --conf spark.ui.enabled=false \
    --class graft.FaultProofStream "$JAR" "$mode" \
    2>"/tmp/faultproof_stream_$mode.err")
  st=$?
  printf '%s\n' "$out" | grep '"proof"'
  if [ $st -ne 0 ] || \
     ! printf '%s\n' "$out" | grep -q '"expected_outcome":true'; then
    echo "FAIL mode=$mode exit=$st (see /tmp/faultproof_stream_$mode.err)"
    rc=1
  fi
done
exit $rc
