#!/usr/bin/env python3
"""Budget-drift gate: compare a cold bench pass (BENCH_DETAIL.json format)
against the committed per-query cold budgets (COLD_BUDGET.json) and exit
nonzero listing every query whose cold time exceeds budget-max x TOLERANCE.

COLD_BUDGET.json existed since r10 but nothing FAILED when a plan change
blew a budget — a regression could ride until the judge's cross-round diff.
This makes the budget a gate: run after any plan-affecting change (quiet box
only — the x2 tolerance absorbs page-cache/contention variance, not a
contended box).

Coverage is part of the gate (r11 hole: q217/q218 ran ungated for a round
because only the intersection of bench times and budgets was checked):
 - a bench query with NO budget entry FAILS the gate — regenerate budgets
   (tools/cold_budget.sh) when the query surface grows;
 - a budget entry with NO bench time is reported as stale (renamed/removed
   query) so COLD_BUDGET.json can't silently rot.

Usage: tools/budget_gate.py <bench_detail.json> [cold_budget.json] [tolerance]
"""
import sys, json

def main():
    detail_path = sys.argv[1]
    budget_path = sys.argv[2] if len(sys.argv) > 2 else "COLD_BUDGET.json"
    tol = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    detail = json.load(open(detail_path))
    budget = json.load(open(budget_path))
    if int(detail.get("failed", 0)) != 0:
        print(f"[budget_gate] FAIL: bench pass had failures: {detail.get('errors')}")
        return 1
    times = detail["queries"]
    budgets = budget["queries"]
    failed = False
    missing = sorted(set(times) - set(budgets))
    if missing:
        print(f"[budget_gate] FAIL: {len(missing)} bench queries have no budget "
              f"entry (run tools/cold_budget.sh): {', '.join(missing)}")
        failed = True
    stale = sorted(set(budgets) - set(times))
    if stale:
        print(f"[budget_gate] FAIL: {len(stale)} budget entries match no bench "
              f"query (renamed/removed?): {', '.join(stale)}")
        failed = True
    offenders = []
    for name in sorted(set(times) & set(budgets)):
        limit = budgets[name]["max"] * tol
        if times[name] > limit:
            offenders.append((name, times[name], budgets[name]["max"], limit))
    if offenders:
        print(f"[budget_gate] FAIL: {len(offenders)} queries over budget-max x{tol}:")
        for name, t, bmax, limit in offenders:
            print(f"  {name}: cold {t:.3f}s > {limit:.3f}s "
                  f"(budget max {bmax:.3f}s, ratio {t / bmax:.2f}x)")
        failed = True
    if failed:
        return 1
    worst = max(((times[n] / budgets[n]["max"], n)
                 for n in set(times) & set(budgets)), default=(0.0, "-"))
    print(f"[budget_gate] ok: {len(set(times) & set(budgets))} queries within "
          f"budget-max x{tol} (worst ratio {worst[0]:.2f}x on {worst[1]})")
    return 0

if __name__ == "__main__":
    sys.exit(main())
