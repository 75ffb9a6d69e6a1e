#!/usr/bin/env python3
"""Merge N cold-only BENCH_DETAIL.json passes (tools/cold_budget.sh) into a
per-query cold-cost budget table: min / median / max first-execution seconds
per query across the fresh-JVM passes, plus suite totals. The committed
artifact (COLD_BUDGET.json) is the reference any driver cold reading is
diffed against."""
import sys, json, statistics

def main():
    sf, out, passes = sys.argv[1], sys.argv[2], sys.argv[3:]
    runs = []
    for p in passes:
        d = json.load(open(p))
        if int(d.get("failed", 0)) != 0:
            raise SystemExit(f"pass {p} had failures: {d.get('errors')}")
        runs.append(d["queries"])
    names = sorted(runs[0])
    for r in runs[1:]:
        if sorted(r) != names:
            raise SystemExit("query sets differ between passes")
    queries = {}
    for n in names:
        ts = sorted(r[n] for r in runs)
        queries[n] = {
            "min": round(ts[0], 3),
            "median": round(statistics.median(ts), 3),
            "max": round(ts[-1], 3),
        }
    budget = {
        "sf": sf,
        "passes": len(runs),
        "tool": "tools/cold_budget.sh (fresh-JVM whole-suite cold passes)",
        "total_min": round(sum(q["min"] for q in queries.values()), 1),
        "total_median": round(sum(q["median"] for q in queries.values()), 1),
        "queries": queries,
    }
    with open(out, "w") as f:
        json.dump(budget, f, indent=1, sort_keys=True)

if __name__ == "__main__":
    main()
