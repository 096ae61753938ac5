"""Per-query sf1 regression gate (VERDICT r7 item 2).

Re-derives budget violations from the committed BENCH_FULL.json and
tools/sf1_budgets.json (never trusting the artifact's own
``budget_violations`` list): for every query with a pinned alpha and
both timings, asserts ``sf1 <= alpha · R · sf0.1 + 1s``.

Exit 1 iff a CLEAN artifact (neither pass steal-contaminated) violates
a budget. A contaminated artifact exits 0 with a loud warning — its
numbers are noise, and the ``steal_contaminated`` self-flag is already
the signal the round's reviewers read; failing verifyall for host
weather would train people to ignore the gate.

Usage: python tools/sf1_budget_gate.py [BENCH_FULL.json]
"""

from __future__ import annotations

import json
import os
import sys

TOOLS = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(TOOLS)


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "BENCH_FULL.json")
    bpath = os.path.join(TOOLS, "sf1_budgets.json")
    if not os.path.exists(bpath):
        print("sf1-budget-gate: no tools/sf1_budgets.json pinned yet — skipping")
        return 0
    with open(bpath) as f:
        alpha = json.load(f)["alpha"]
    if not os.path.exists(src):
        print("sf1-budget-gate: no BENCH_FULL.json — skipping")
        return 0
    with open(src) as f:
        full = json.load(f)
    sf1 = full.get("sf1") or {}
    queries = sf1.get("queries") or {}
    timings = full.get("queries") or {}
    R = sf1.get("replication", 10)
    steal = sf1.get("steal_sec")
    measured = sf1.get("measured_sec") or 0.0
    contaminated = bool(full.get("steal_contaminated")) or (
        steal is not None and measured > 0 and steal > 0.5 * measured
    )
    checked, violations = 0, []
    for n, a in sorted(alpha.items()):
        w, t = queries.get(n), timings.get(n)
        if not (isinstance(w, (int, float)) and isinstance(t, (int, float))):
            continue
        checked += 1
        limit = a * R * t + 1.0
        if w > limit:
            violations.append(f"{n}: sf1 {w:.2f}s > {limit:.2f}s "
                              f"(alpha {a}, sf0.1 {t:.3f}s)")
    for v in violations:
        print(f"VIOLATION {v}")
    if violations and contaminated:
        print(f"sf1-budget-gate: {len(violations)}/{checked} over budget but the "
              "artifact is STEAL-CONTAMINATED — numbers are host noise, not "
              "verdicts. Re-bench on a quiet host.")
        return 0
    if violations:
        print(f"sf1-budget-gate: FAIL — {len(violations)}/{checked} queries over "
              "their pinned sf1 budget on a clean run")
        return 1
    note = " (artifact steal-contaminated)" if contaminated else ""
    print(f"sf1-budget-gate: {checked} queries within budget{note}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
