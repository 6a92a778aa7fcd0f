#!/usr/bin/env bash
# Window-classification probe: "is now a good time to gate?" in ~30s.
#
# Runs a FIXED 3-entry isolated bench (the judge's r15 A/B shape) with
# the r16 per-rep probes (JVM-process-CPU utilization, /proc/stat
# steal%) and prints ONE JSON line classifying the current measurement
# window. Use before committing any official bench number: a `hot`
# window inflates suite totals 25-180% with NO loadavg signature (r15:
# the 109.24s gate ran at mean_load 3.58 while the 136-142s hot windows
# sat at 2.79-2.90; the judge's A/B measured 18.94s@3.95 vs 6.79s@4.36
# - the SLOWER window reported the LOWER load).
#
# Classification (any one suffices for `hot`):
#   - mean_steal >= 3.0       hypervisor withholding cycles outright
#     (idle brackets on this guest measure ~0-0.5%; the recorded hot
#     windows measured 5-8% - BASELINE.md "Round-16 window probes")
#   - total > 1.5 x quiet ref  the fixed set ran far over its quiet cost
#   - mean_util < 0.65 x ref   the JVM got well under its quiet-window
#     share of the machine on identical work
#
# The quiet references are calibrated observations of THIS fixed set at
# sf0.1 (BASELINE.md "Round-16 window probes"); recalibrate by editing
# the two constants after a recorded quiet run if the set or host
# changes. Needs `sbt package` first (same prerequisite as
# tools/faultproof.sh). Exit 0 quiet / 1 hot / 2 unusable.
set -u
SF="${1:-/root/testdata/sf0.1}"
JAR="target/scala-2.13/mapreduce_codespark_2.13-0.1.0.jar"
[ -f "$JAR" ] || { echo "run 'sbt package' first"; exit 2; }
SET="apriori_freq_itemsets_txorder,rel_rank_movers,llm_dedup_ngram"
QUIET_TOTAL=3.28   # calibrated quiet-window total (sec) for SET at sf0.1 (r16-opt: the round-16 optimizations cut the probe set >2x; old ref 7.38)
QUIET_UTIL=0.15    # calibrated quiet-window mean_util for SET at sf0.1 (r16-opt)

# Same JVM shape as the sbt-forked gate bench (build.sbt javaOptions):
# JDK17 module opens + 8g heap, master local[32] via SPARK_GRAFT_CPUS.
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

out=$(SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_BENCH_ONLY="$SET" \
  SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_SAMPLES=/tmp/benchwindow_samples.json \
  timeout 300 java $OPENS -Xmx"${SPARK_DRIVER_MEM:-8g}" \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$JAR:/opt/spark/jars/*" graft.Bench \
    2>/tmp/benchwindow.err) || {
  echo '{"probe":"benchwindow","window":"unusable","err":"bench run failed (see /tmp/benchwindow.err)"}'
  exit 2
}
line=$(printf '%s\n' "$out" | grep '"total_compact"' | tail -1)
[ -n "$line" ] || {
  echo '{"probe":"benchwindow","window":"unusable","err":"no total_compact line"}'
  exit 2
}

printf '%s' "$line" | QUIET_TOTAL="$QUIET_TOTAL" QUIET_UTIL="$QUIET_UTIL" \
  SF="$SF" SET="$SET" python3 -c '
import json, os, sys
j = json.loads(sys.stdin.read().strip())
qt, qu = float(os.environ["QUIET_TOTAL"]), float(os.environ["QUIET_UTIL"])
total, util, steal = j["value"], j["mean_util"], j["mean_steal"]
why = []
if steal >= 3.0: why.append("steal")
if total > 1.5 * qt: why.append("total")
if 0 <= util < 0.65 * qu: why.append("util")
window = "hot" if why else ("unknown" if util < 0 and steal < 0 else "quiet")
print(json.dumps({"probe": "benchwindow", "window": window,
  "why": why, "total": total, "mean_util": util, "mean_steal": steal,
  "mean_load": j["mean_load"], "n_errors": j["n_errors"],
  "quiet_ref_total": qt, "quiet_ref_util": qu,
  "set": os.environ["SET"], "sf": os.environ["SF"]}))
sys.exit(1 if window == "hot" else 0)
'
