#!/usr/bin/env bash
# 10x-scale value-audit chain (VERDICT r14 task 3): one command that
# reproduces the recorded four-stage sf0.1 audit (BASELINE.md
# "Round-14 10x-scale value audit") against a fresh graft.Verify dump,
# with a single exit code — the faultproof.sh pattern. Stages:
#   1. budget-60 sweep of the FULL oracle set (fast oracles verify
#      plainly; the known-slow recompositions hit the watchdog);
#   2. llm_dedup_minhash verified UN-staged at a big budget — the one
#      O(n^2)-in-DuckDB cost, and the root of the staging trust chain
#      (every recomposition embeds its exact pair set verbatim);
#   3. llm_dedup_clusters + llm_curate verified with the minhash
#      oracle TEXT staged (replaced by its now-trusted Verify parquet);
#   4. every remaining stage-1 timeout verified with all three bases
#      staged, at budget 300 (honest oracle cost for the 50-epoch
#      trainer replays and graph fixed-points at 10x).
# A staged check verifies the DOWNSTREAM aggregation/join layers
# against trusted rows; the bases themselves are verified unstaged
# (minhash) or one-level-staged, so the chain roots in a
# full-fidelity compare. PASS = every oracle name ends status=pass.
#
# Usage: tools/audit_chain.sh <sfDir> <verifyOutDir>
#   (verifyOutDir = a completed `runMain graft.Verify <sfDir> <dir>`)
set -u
SF="${1:?usage: tools/audit_chain.sh <sfDir> <verifyOutDir>}"
OUT="${2:?usage: tools/audit_chain.sh <sfDir> <verifyOutDir>}"
HERE="$(cd "$(dirname "$0")" && pwd)"
TMP="${AUDIT_TMP:-/tmp/audit_chain}"
mkdir -p "$TMP"
[ -f "$OUT/oracle_sql.json" ] || {
  echo "no $OUT/oracle_sql.json - run graft.Verify first"; exit 2; }

BASES="llm_dedup_minhash,llm_dedup_clusters,llm_curate"

run_stage() { # name, extra audit_sf01.py args...
  local name="$1"; shift
  echo "== $name =="
  # no pipe around the python: a pipeline's status is the LAST
  # command's (the faultproof.sh r14 advice bug) — log then tail
  python3 "$HERE/audit_sf01.py" "$SF" "$OUT" \
    --out-json "$TMP/$name.json" "$@" > "$TMP/$name.log" 2>&1
  local st=$?
  tail -3 "$TMP/$name.log"
  # any nonzero stage is fatal immediately — but say WHICH kind: the
  # audit exits 1 with a results file on value mismatches; a crash
  # (missing duckdb, unreadable dump, OOM) dies before writing one.
  # Misattributing infrastructure failure as "engine produced wrong
  # values" would send the round chasing a correctness bug that never
  # happened (timeouts are the chain's business and exit 0).
  if [ $st -ne 0 ]; then
    if [ -f "$TMP/$name.json" ] && \
       grep -q '"status": *"fail"' "$TMP/$name.json"; then
      echo "FAIL: $name reported VALUE MISMATCHES (exit $st," \
        "$TMP/$name.json)"
    else
      echo "FAIL: $name crashed before/without reporting mismatches" \
        "(exit $st, see $TMP/$name.log)"
    fi
    exit 1
  fi
}

timeouts_of() { # stage results json -> comma list of timeout names
  python3 - "$1" <<'EOF'
import json, sys
r = json.load(open(sys.argv[1]))
print(",".join(n for n in sorted(r) if r[n]["status"] == "timeout"))
EOF
}

run_stage stage1 --budget 60
T1=$(timeouts_of "$TMP/stage1.json")
echo "stage1 timeouts: ${T1:-none}"

# stage 2: the trust root, unstaged. Skip only if stage 1 already
# verified it (a fast host inside budget 60 is the same full check).
if echo ",$T1," | grep -q ",llm_dedup_minhash,"; then
  run_stage stage2 --only llm_dedup_minhash --budget 1500
fi

# stage 3: the two direct composites over the now-trusted pair set
S3=$(python3 - "$TMP/stage1.json" <<'EOF'
import json, sys
r = json.load(open(sys.argv[1]))
want = [n for n in ("llm_dedup_clusters", "llm_curate")
        if r.get(n, {}).get("status") == "timeout"]
print(",".join(want))
EOF
)
if [ -n "$S3" ]; then
  run_stage stage3 --only "$S3" --stage llm_dedup_minhash --budget 300
fi

# stage 4: every other stage-1 timeout, all three bases staged
S4=$(python3 - "$TMP/stage1.json" <<'EOF'
import json, sys
r = json.load(open(sys.argv[1]))
skip = {"llm_dedup_minhash", "llm_dedup_clusters", "llm_curate"}
print(",".join(n for n in sorted(r)
               if r[n]["status"] == "timeout" and n not in skip))
EOF
)
if [ -n "$S4" ]; then
  run_stage stage4 --only "$S4" --stage "$BASES" --budget 300
fi

# merge: later stages override their entries; every oracle must pass
python3 - "$OUT" "$TMP" <<'EOF'
import json, os, sys
out, tmp = sys.argv[1], sys.argv[2]
oracle = json.load(open(f"{out}/oracle_sql.json"))
merged = {}
stages = {}
for s in ("stage1", "stage2", "stage3", "stage4"):
    p = f"{tmp}/{s}.json"
    if os.path.exists(p):
        r = json.load(open(p))
        merged.update(r)
        stages[s] = {"n": len(r),
                     "pass": sum(v["status"] == "pass"
                                 for v in r.values())}
not_pass = {n: merged.get(n, {"status": "missing"})["status"]
            for n in sorted(oracle)
            if merged.get(n, {}).get("status") != "pass"}
summary = {"audit_chain": "sf0.1", "n_oracles": len(oracle),
           "n_pass": len(oracle) - len(not_pass),
           "stages": stages, "not_pass": not_pass,
           "ok": not not_pass}
json.dump(merged, open(f"{tmp}/merged.json", "w"), indent=0)
print(json.dumps(summary))
sys.exit(0 if summary["ok"] else 1)
EOF
