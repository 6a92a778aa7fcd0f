#!/usr/bin/env python3
"""Scaling-exponent report (r16): turn the two same-window bench sample
files written by tools/scaling_study.sh into the per-family table
recorded in BASELINE.md "Round-16 scaling exponents".

For each entry: median-of-reps at sf0.1 and at the ScaleUp sf1 (10x
rows), ratio r = t(sf1)/t(sf0.1), and the implied exponent
e = log10(r) (r=10 -> e=1.0 linear; r=~12.5 -> n*log n; r=100 -> e=2
quadratic). Entries under FLOOR_SEC at BOTH scales are reported but
not classified - their cost is fixed overhead (plan+launch), and a
ratio of two overhead numbers carries no scaling signal.

Super-linear flag: ratio > NLOGN_BOUND (n*log n at 10x growth is
~12.5x; the bound adds headroom for rep noise). Flagged entries must
be fixed or floor-tagged with a recorded reason.

Usage: tools/scaling_report.py [sf01.json] [sf1.json] [--md]
"""
import json
import math
import sys

FLOOR_SEC = 0.30     # below this at both scales = overhead-dominated
NLOGN_BOUND = 14.0   # 10x data: linear=10, n*log n=~12.5, +noise headroom


def med(xs):
    s = sorted(xs)
    return s[len(s) // 2] if s else float("nan")


def family(name):
    for p in ("apriori", "sgd", "rel", "stream", "graph", "llm"):
        if name.startswith(p + "_"):
            return p
    return "other"


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf01_path = args[0] if len(args) > 0 else "/tmp/scaling_sf01.json"
    sf1_path = args[1] if len(args) > 1 else "/tmp/scaling_sf1.json"
    a = json.load(open(sf01_path))
    b = json.load(open(sf1_path))
    sa, sb = a["samples"], b["samples"]
    names = sorted(set(sa) & set(sb))
    missing = sorted(set(sa) ^ set(sb))
    rows = []
    for n in names:
        t0, t1 = med(sa[n]), med(sb[n])
        r = t1 / t0 if t0 > 0 else float("nan")
        small = t0 < FLOOR_SEC and t1 < FLOOR_SEC
        rows.append({
            "name": n, "family": family(n), "t_sf01": round(t0, 3),
            "t_sf1": round(t1, 3), "ratio": round(r, 2),
            "exponent": round(math.log10(r), 2) if r > 0 else None,
            "class": ("overhead" if small else
                      "superlinear" if r > NLOGN_BOUND else
                      "sublinear" if r < 3.0 else "linear-ish"),
        })
    fams = {}
    for row in rows:
        fams.setdefault(row["family"], []).append(row)
    out = {
        "n_entries": len(rows),
        "missing_either_side": missing,
        "total_sf01": round(sum(r["t_sf01"] for r in rows), 2),
        "total_sf1": round(sum(r["t_sf1"] for r in rows), 2),
        "mean_util_sf01": a.get("mean_util"), "mean_util_sf1": b.get("mean_util"),
        "mean_steal_sf01": a.get("mean_steal"), "mean_steal_sf1": b.get("mean_steal"),
        "superlinear": [r for r in rows if r["class"] == "superlinear"],
        "families": {
            f: {
                "n": len(rs),
                "measured": len([r for r in rs if r["class"] != "overhead"]),
                "median_ratio": med([r["ratio"] for r in rs
                                     if r["class"] != "overhead"]),
                "max_ratio": max((r["ratio"] for r in rs
                                  if r["class"] != "overhead"), default=None),
                "top": sorted([r for r in rs if r["class"] != "overhead"],
                              key=lambda r: -r["ratio"])[:8],
            } for f, rs in sorted(fams.items())
        },
    }
    if "--md" in sys.argv:
        print("| family | entries | measured | median ratio | max ratio |"
              " worst entries (ratio) |")
        print("|---|---|---|---|---|---|")
        for f, d in out["families"].items():
            tops = ", ".join(f"{r['name']} ({r['ratio']})"
                             for r in d["top"][:3])
            print(f"| {f} | {d['n']} | {d['measured']} |"
                  f" {d['median_ratio']} | {d['max_ratio']} | {tops} |")
    else:
        print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
