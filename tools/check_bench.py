#!/usr/bin/env python3
"""Per-query performance budget gate.

Compares a fresh Bench artifact (bench_out.json) against the checked-in
budget (tools/bench_budget.json = the last round-close idle sf0.1
medians) and fails loudly on regressions, making "within tolerance of
the last known-good number" an enforceable per-query contract instead
of a round-close eyeball.

Usage:
  python3 tools/check_bench.py bench_out.json            # gate (exit 1 on violation)
  python3 tools/check_bench.py bench_out.json --tolerance 1.4
  python3 tools/check_bench.py runA.json [runB.json ...] --update
      # re-baseline: elementwise MAX across the given idle artifacts

Rules:
  - violation: cur > tolerance * max(budget, floor). The floor (0.15 s)
    keeps sub-100 ms queries from tripping the gate on scheduler noise.
  - the budget must be the elementwise MAX over >= 2 idle round-close
    runs: measured r11, two idle runs 30 min apart each put a DISJOINT
    ~dozen sub-second queries past 1.5x of the other (long-tailed
    JIT/GC timing, not regressions) — a single run's medians sit on the
    lucky side of that noise for some queries. Against the slow-side
    max, the default 1.5x tolerance is a real-regression detector
    again (a real regression is a multiple, not a percent).
  - queries missing from the budget are listed as UNBUDGETED (info, not
    failure) so a round that adds entries still gates the old ones;
    rerun with --update at the idle round-close to adopt them.
  - a query at -1 (every rep failed) is always a violation.
"""
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
BUDGET_PATH = os.path.join(HERE, "bench_budget.json")
FLOOR_S = 0.15
DEFAULT_TOL = 1.5


def main() -> int:
    args = [a for a in sys.argv[1:]]
    tol = DEFAULT_TOL
    update = "--update" in args
    if "--tolerance" in args:
        # consume the value by index — filtering positionals by string
        # equality with str(tol) drops '1.4' but not '1.40'
        i = args.index("--tolerance")
        tol = float(args[i + 1])
        del args[i:i + 2]
    paths = [a for a in args if not a.startswith("--")]
    if not paths:
        print(__doc__)
        return 2
    with open(paths[0]) as f:
        first = json.load(f)
    cur = first["queries"]
    cur_healed = set(first.get("healed", []))

    if update:
        # healed medians are min-of-two (the lucky side): prefer the max
        # over CLEAN medians; fall back to a healed value only when no
        # artifact has a clean one for that name, and say so.
        clean, healed_only = {}, {}
        for path in paths:
            with open(path) as f:
                art = json.load(f)
            h = set(art.get("healed", []))
            for name, sec in art["queries"].items():
                if sec < 0:
                    continue
                tgt = healed_only if name in h else clean
                if sec > tgt.get(name, -1.0):
                    tgt[name] = sec
        merged = dict(clean)
        fell_back = sorted(set(healed_only) - set(clean))
        for name in fell_back:
            merged[name] = healed_only[name]
        with open(BUDGET_PATH, "w") as f:
            json.dump(dict(sorted(merged.items())), f, indent=1)
        print(f"budget re-baselined: {len(merged)} queries "
              f"(elementwise max over {len(paths)} artifact(s)) -> {BUDGET_PATH}")
        if fell_back:
            print(f"note: {len(fell_back)} budgets adopted from HEALED medians "
                  f"(no clean measurement in any artifact): {', '.join(fell_back)}")
        return 0

    if not os.path.exists(BUDGET_PATH):
        print(f"no budget at {BUDGET_PATH}; run with --update on an idle "
              "round-close artifact first")
        return 2
    with open(BUDGET_PATH) as f:
        budget = json.load(f)

    violations, unbudgeted, gone = [], [], []
    for name, sec in sorted(cur.items()):
        if sec < 0:
            violations.append((name, sec, budget.get(name, float("nan")), "FAILED (-1)"))
            continue
        if name not in budget:
            unbudgeted.append((name, sec))
            continue
        cap = tol * max(budget[name], FLOOR_S)
        if sec > cap:
            violations.append((name, sec, budget[name], f"> {cap:.3f}s cap"))
    gone = sorted(set(budget) - set(cur))

    for name, sec in unbudgeted:
        print(f"UNBUDGETED {name}: {sec:.3f}s (adopt with --update at round close)")
    if cur_healed:
        shown = sorted(cur_healed)
        print(f"note: {len(shown)} healed (re-measured min-of-two) medians in "
              f"this artifact: {', '.join(shown)}")
    if gone:
        print(f"note: {len(gone)} budgeted queries absent from this artifact "
              f"(subset run?): {', '.join(gone[:6])}{'...' if len(gone) > 6 else ''}")
    for name, sec, bud, why in violations:
        print(f"VIOLATION {name}: {sec:.3f}s vs budget {bud:.3f}s ({why})")
    n_gated = sum(1 for n in cur if n in budget)
    if violations:
        print(f"== {len(violations)} violation(s) over {n_gated} gated queries ==")
        return 1
    print(f"== bench within budget: {n_gated} gated, "
          f"{len(unbudgeted)} unbudgeted, tolerance {tol}x ==")
    return 0


if __name__ == "__main__":
    sys.exit(main())
