#!/usr/bin/env python3
"""10x-scale value audit (SURVEY §5 risk note; VERDICT r13 task 3): run the
FULL oracle set against a graft.Verify output at sf0.1, with a per-oracle
watchdog so a known-slow oracle times out instead of hanging the sweep.

Differences from tools/compare.py (the sf0.01 gate mimic):
  - per-oracle TIMEOUT via duckdb interrupt (default 120 s) -> status
    "timeout" instead of a half-hour single-threaded stall;
  - --only / --skip name filters and a JSON results file for staging
    multi-session sweeps;
  - oracles listed in RESTAGED run a DECOMPOSED check instead: the
    Spark-side shared intermediate (band index / kept set), itself
    value-verified by its own entry, is read from the Verify output and
    the oracle verifies only the DOWNSTREAM aggregation/join layers.

Driver-side-only deps (duckdb/pandas) — never imported by shipped Scala.

Usage: python3 tools/audit_sf01.py <sfDir> <verifyOutDir>
         [--budget SEC] [--only a,b] [--skip a,b] [--out results.json]
"""
import argparse
import json
import math
import sys
import threading
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def cell_eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    if isinstance(a, float) != isinstance(b, float):
        return False
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b or abs(a - b) <= max(math.ulp(a), math.ulp(b))
    return a == b


def run_with_timeout(con, sql, budget):
    """Run sql on con; interrupt past budget. Returns (df|None, sec, err)."""
    out = {}

    def work():
        try:
            out["df"] = con.sql(sql).df()
        except Exception as e:  # includes InterruptException
            out["err"] = str(e)

    t0 = time.monotonic()
    th = threading.Thread(target=work, daemon=True)
    th.start()
    th.join(budget)
    if th.is_alive():
        con.interrupt()
        th.join(30)
        return None, time.monotonic() - t0, "TIMEOUT"
    sec = time.monotonic() - t0
    if "err" in out:
        return None, sec, out["err"][:200]
    return out["df"], sec, None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sf")
    ap.add_argument("out")
    ap.add_argument("--budget", type=float, default=120.0)
    ap.add_argument("--only", default="")
    ap.add_argument("--skip", default="")
    ap.add_argument("--stage", default="",
                    help="comma-sep entry names whose ALREADY-VERIFIED "
                         "Verify output replaces their oracle text when "
                         "embedded inside other oracles (SURVEY §7.3: "
                         "pre-materialize in Spark, verify the "
                         "downstream layers). Verify each staged base "
                         "FIRST (big budget / its own restage).")
    ap.add_argument("--out-json", default="/tmp/audit_sf01_results.json")
    args = ap.parse_args()

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")
    oracle = json.load(open(f"{args.out}/oracle_sql.json"))
    only = set(x for x in args.only.split(",") if x)
    skip = set(x for x in args.skip.split(",") if x)
    names = [n for n in sorted(oracle) if (not only or n in only)
             and n not in skip]
    # staged substitution: the generated oracle SQL embeds shared
    # derivations (the exact all-pairs pair set, the label-prop
    # clusters, the curate kept set) VERBATIM, so replacing a staged
    # base's full text with a read of its (already value-verified at
    # this scale) Verify parquet turns an O(n^2)-in-DuckDB recompute
    # into a join against trusted rows — the audit then checks the
    # DOWNSTREAM layers. Longest text first so composites rewrite
    # before the pieces they embed.
    staged = [s for s in args.stage.split(",") if s]
    staged.sort(key=lambda s: -len(oracle[s]))

    def restage(name, sql):
        subs = []
        for s in staged:
            if s != name and oracle[s] in sql:
                sql = sql.replace(
                    oracle[s],
                    f"SELECT * FROM '{args.out}/{s}/*.parquet'")
                subs.append(s)
        return sql, subs

    results = {}
    n_pass = n_fail = n_timeout = 0
    for name in names:
        try:
            got = canon(con.sql(
                f"SELECT * FROM '{args.out}/{name}/*.parquet'").df())
        except Exception as e:
            results[name] = {"status": "fail", "why": f"read: {e}"[:200]}
            n_fail += 1
            print(f"FAIL {name}: read: {e}")
            continue
        sql, subs = restage(name, oracle[name])
        exp_df, sec, err = run_with_timeout(con, sql, args.budget)
        if err == "TIMEOUT":
            results[name] = {"status": "timeout", "sec": round(sec, 1)}
            n_timeout += 1
            print(f"TIMEOUT {name}: {sec:.0f}s")
            continue
        if err:
            results[name] = {"status": "fail", "why": err}
            n_fail += 1
            print(f"FAIL {name}: {err}")
            continue
        exp = canon(exp_df)
        why = None
        if list(got.columns) != list(exp.columns):
            why = f"columns {list(got.columns)} vs {list(exp.columns)}"
        elif len(got) != len(exp):
            why = f"{len(got)} rows vs oracle {len(exp)}"
        else:
            gv, ev = got.values.tolist(), exp.values.tolist()
            for i in range(len(gv)):
                if why:
                    break
                for j in range(len(got.columns)):
                    if not cell_eq(gv[i][j], ev[i][j]):
                        why = (f"cell ({i},{got.columns[j]}): "
                               f"{gv[i][j]} vs {ev[i][j]}")
                        break
        if why:
            results[name] = {"status": "fail", "why": why[:300],
                             "sec": round(sec, 1)}
            n_fail += 1
            print(f"FAIL {name}: {why}")
        else:
            results[name] = {"status": "pass", "rows": len(got),
                             "sec": round(sec, 1)}
            if subs:
                results[name]["staged"] = subs
            n_pass += 1
            tag = f" [{sec:.1f}s]" if sec > 5 else ""
            if subs:
                tag += f" staged:{','.join(subs)}"
            print(f"PASS {name} ({len(got)} rows){tag}")
    json.dump(results, open(args.out_json, "w"), indent=0)
    print(f"== {n_pass} pass, {n_fail} fail, {n_timeout} timeout "
          f"(of {len(names)}) ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
