"""Pin per-query sf1 regression budgets from a verified-clean bench run.

For each query with both an sf0.1 timing and an sf1 (×10) timing in a
BENCH_FULL.json, pins ``alpha = sf1 / (R · sf0.1)`` with 1.5× headroom
(floored at 0.3, capped at the generic superlinear bound 2.0). The
bench's sf1 section then enforces ``sf1 <= alpha · R · sf0.1 + 1s`` per
query (``budget_violations`` in the artifact; ``tools/sf1_budget_gate.py``
turns it into a verifyall failure), so a single noisy host can neither
mask nor fabricate a per-query superlinear regression — before this,
only the aggregate ``superlinear: []`` gate (alpha 2.0 + 3s) existed.

REFUSES to pin from a steal-contaminated artifact: budgets must come
from a run whose numbers mean something.

Usage: python tools/make_sf1_budgets.py [BENCH_FULL.json] [--merge]
Writes tools/sf1_budgets.json. ``--merge`` keeps every existing pinned
alpha untouched and only ADDS queries with no pin yet (suite additions)
— re-pinning wholesale could silently loosen tight budgets.
"""

from __future__ import annotations

import json
import os
import sys

TOOLS = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(TOOLS)

HEADROOM = 1.5
FLOOR = 0.3
CAP = 2.0


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--merge"]
    # --merge: keep every EXISTING pinned alpha untouched (re-pinning
    # wholesale from a newer run could silently LOOSEN tight budgets)
    # and add only queries that have no pin yet — for suite additions
    merge = "--merge" in sys.argv[1:]
    src = args[0] if args else os.path.join(REPO, "BENCH_FULL.json")
    with open(src) as f:
        full = json.load(f)
    sf1 = full.get("sf1") or {}
    if full.get("steal_contaminated"):
        print("REFUSED: artifact is steal-contaminated", file=sys.stderr)
        return 1
    steal = sf1.get("steal_sec")
    measured = sf1.get("measured_sec") or 0.0
    if steal is not None and measured > 0 and steal > 0.5 * measured:
        print(f"REFUSED: sf1 pass steal-contaminated ({steal}s vs {measured}s)",
              file=sys.stderr)
        return 1
    queries = sf1.get("queries") or {}
    timings = full.get("queries") or {}
    R = sf1.get("replication", 10)
    alpha = {}
    for n, w in sorted(queries.items()):
        t = timings.get(n)
        if not (isinstance(w, (int, float)) and isinstance(t, (int, float)) and t > 0):
            continue
        a = min(CAP, max(FLOOR, HEADROOM * w / (R * t)))
        alpha[n] = round(a, 3)
    if len(alpha) < 50:
        print(f"REFUSED: only {len(alpha)} queries have both timings", file=sys.stderr)
        return 1
    dst = os.path.join(TOOLS, "sf1_budgets.json")
    if merge and os.path.exists(dst):
        with open(dst) as f:
            existing = json.load(f)
        added = {n: a for n, a in alpha.items() if n not in existing["alpha"]}
        existing["alpha"].update(added)
        existing.setdefault("source", {})["merged_from"] = os.path.basename(src)
        with open(dst, "w") as f:
            json.dump(existing, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"merged {len(added)} new budgets ({sorted(added)}) -> {dst}; "
              f"{len(existing['alpha'])} total, existing pins untouched")
        return 0
    out = {
        "source": {
            "file": os.path.basename(src),
            # alphas are core-count-specific ratios; bench.py and the
            # gate skip the alpha check when run off this core count
            "pinned_cpus": int(full.get("cpus", 32)),
            "suite_total_sec": full.get("value"),
            "steal_sec": full.get("steal_sec"),
            "sf1_steal_sec": steal,
            "sf1_measured_sec": measured,
            "replication": R,
            "headroom": HEADROOM,
            "floor": FLOOR,
            "cap": CAP,
        },
        "alpha": alpha,
    }
    dst = os.path.join(TOOLS, "sf1_budgets.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"pinned {len(alpha)} budgets -> {dst} "
          f"(max alpha {max(alpha.values()):.2f})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
