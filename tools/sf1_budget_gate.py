"""Per-query sf1 regression gate (VERDICT r7 item 2; provenance r8 item 2).

Re-derives budget violations from BENCH_FULL.json and
tools/sf1_budgets.json (never trusting the artifact's own
``budget_violations`` list): for every query with a pinned alpha and
both timings, asserts ``sf1 <= alpha · R · sf0.1 + 1s``.

Artifact provenance (r8 VERDICT item 2): the gate only ever judges a
CLEAN artifact. If the default working-tree BENCH_FULL.json is
steal-contaminated (the driver's end-of-round bench can overwrite it
under host noise), the gate falls back to the committed snapshot
(``git show HEAD:BENCH_FULL.json``); if that is also contaminated or
unavailable, it FAILS LOUD with instructions instead of blessing noise
with an exit 0 — the r8 failure mode where a flagged artifact still
passed verifyall.

Usage: python tools/sf1_budget_gate.py [BENCH_FULL.json]
       [--budgets tools/sf1_budgets.json] [--fallback PATH|git:HEAD|none]

An explicit positional src skips nothing else — fallback still applies
unless ``--fallback none``.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

TOOLS = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(TOOLS)


def _contaminated(full: dict) -> bool:
    sf1 = full.get("sf1") or {}
    steal = sf1.get("steal_sec")
    measured = sf1.get("measured_sec") or 0.0
    return bool(full.get("steal_contaminated")) or (
        steal is not None and measured > 0 and steal > 0.5 * measured
    )


def _load_fallback(spec: str) -> dict | None:
    """Load the fallback artifact: a file path, or ``git:HEAD`` for the
    committed snapshot of BENCH_FULL.json."""
    if spec == "none":
        return None
    if spec == "git:HEAD":
        try:
            out = subprocess.run(
                ["git", "show", "HEAD:BENCH_FULL.json"],
                cwd=REPO, capture_output=True, text=True, timeout=30,
            )
        except Exception:
            return None
        if out.returncode != 0:
            return None
        try:
            return json.loads(out.stdout)
        except ValueError:
            return None
    if not os.path.exists(spec):
        return None
    with open(spec) as f:
        return json.load(f)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("src", nargs="?", default=os.path.join(REPO, "BENCH_FULL.json"))
    ap.add_argument("--budgets", default=os.path.join(TOOLS, "sf1_budgets.json"))
    ap.add_argument("--fallback", default="git:HEAD",
                    help="clean-artifact fallback when src is contaminated: "
                         "a path, git:HEAD (default), or none")
    a = ap.parse_args(argv)
    if not os.path.exists(a.budgets):
        print("sf1-budget-gate: no tools/sf1_budgets.json pinned yet — skipping")
        return 0
    with open(a.budgets) as f:
        budgets = json.load(f)
    alpha = budgets["alpha"]
    pinned_cpus = budgets.get("source", {}).get("pinned_cpus")
    if not os.path.exists(a.src):
        print("sf1-budget-gate: no BENCH_FULL.json — skipping")
        return 0
    with open(a.src) as f:
        full = json.load(f)
    provenance = a.src
    if _contaminated(full):
        fb = _load_fallback(a.fallback)
        if fb is not None and not _contaminated(fb):
            print(f"sf1-budget-gate: {a.src} is STEAL-CONTAMINATED — gating the "
                  f"clean committed snapshot ({a.fallback}) instead")
            full, provenance = fb, a.fallback
        else:
            where = ("working tree and committed HEAD are both"
                     if fb is not None else "working tree is")
            print(f"sf1-budget-gate: FAIL — {where} steal-contaminated; no clean "
                  "artifact to gate. Re-run `python bench.py` on a quiet host "
                  "and commit the clean BENCH_FULL.json.")
            return 1
    # core-awareness (r12 VERDICT item 2): the alphas are sf1/sf0.1
    # ratios measured at a specific core count; judging an off-reference
    # run (e.g. the driver's 8-core scaling pass) against them fabricates
    # violations. Skip rather than mislead.
    run_cpus = full.get("cpus")
    if (pinned_cpus is not None and run_cpus is not None
            and int(run_cpus) != int(pinned_cpus)):
        print(f"sf1-budget-gate: skipped — artifact ran at {run_cpus} cores, "
              f"budgets pinned at {pinned_cpus} (alphas are core-specific)")
        return 0
    sf1 = full.get("sf1") or {}
    queries = sf1.get("queries") or {}
    timings = full.get("queries") or {}
    R = sf1.get("replication", 10)
    checked, violations = 0, []
    for n, al in sorted(alpha.items()):
        w, t = queries.get(n), timings.get(n)
        if not (isinstance(w, (int, float)) and isinstance(t, (int, float))):
            continue
        checked += 1
        limit = al * R * t + 1.0
        if w > limit:
            violations.append(f"{n}: sf1 {w:.2f}s > {limit:.2f}s "
                              f"(alpha {al}, sf0.1 {t:.3f}s)")
    for v in violations:
        print(f"VIOLATION {v}")
    if violations:
        print(f"sf1-budget-gate: FAIL — {len(violations)}/{checked} queries over "
              "their pinned sf1 budget on a clean run")
        return 1
    print(f"sf1-budget-gate: {checked} queries within budget "
          f"(artifact: {provenance})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
