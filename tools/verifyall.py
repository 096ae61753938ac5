"""One-command verification driver: the full evidence chain in order.

Runs (each independently fatal):
  1. entry-contract smoke from a foreign cwd (driver protocol)
  2. tools/selfcheck.py — all suite cases vs DuckDB at sf0.01, then
     (full mode) the same gate again under SELFCHECK_CONNECT_SIM=1 —
     the simulated Spark Connect surface, suite-wide
  3. tools/fuzzcheck.py — N random pipelines per seed (default 3 seeds),
     plus (full mode) an ANSI-off differential chunk (--ansi) and a
     randomized twin-agreement chunk for the no-oracle rows (--twins)
  4. tools/streamfuzz.py — stateful streaming differential (streaming
     dedup within watermark + update-mode aggregation vs batch)
  5. tools/hoconfuzz.py — config-layer negative-path fuzz: mutated
     conf text / dicts fail typed, never with a raw traceback (~2s)
  6. tools/sf1_budget_gate.py — per-query sf1 regression budgets vs
     the committed BENCH_FULL.json (instant)
  7. tools/emptycheck.py — whole suite over 0-row tables,
     oracle-compared with declared divergences asserted (skipped in
     --fast)
  8. pytest tests/ (CI)

Usage: python tools/verifyall.py [--fast] [--skip-pytest]
  --fast: fuzz 1 seed x 60 at sf0.001 and skip pytest — a ~3 min
          smoke for mid-iteration sanity. Includes the meta-canaries
          stage (the fuzzer's own mutation-sensitivity tests), so any
          change under tools/ is gated before a snapshot.
Exit 0 iff every stage passes.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

TOOLS = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(TOOLS)

ENTRY_SNIPPET = """
import importlib.util
spec = importlib.util.spec_from_file_location('__spark_entry__', {entry!r})
m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m)
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master('local[4]')
         .config('spark.ui.enabled', 'false').getOrCreate())
rows = len(m.entry(spark).collect())
q, o = len(m.queries()), len(m.oracle_sql())
assert rows > 0 and q >= o > 0, (rows, q, o)
print(f'entry ok: {{rows}} rows, {{q}} queries, {{o}} oracles')
"""


def run(name: str, cmd: list[str], cwd: str | None = None,
        env: dict[str, str] | None = None) -> bool:
    t0 = time.monotonic()
    print(f"==> {name}: {' '.join(cmd)}"
          + (f"  [env {env}]" if env else ""), flush=True)
    r = subprocess.run(cmd, cwd=cwd or REPO,
                       env={**os.environ, **env} if env else None)
    ok = r.returncode == 0
    print(f"<== {name}: {'PASS' if ok else 'FAIL'} ({time.monotonic() - t0:.0f}s)",
          flush=True)
    return ok


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--fast", action="store_true")
    ap.add_argument("--skip-pytest", action="store_true")
    a = ap.parse_args()

    sf = "/root/testdata/sf0.001" if a.fast else "/root/testdata/sf0.01"
    seeds = [42] if a.fast else [42, 7, 99]
    n = 60 if a.fast else 200

    stages: list[tuple[str, list[str], str | None]] = [
        ("entry-smoke",
         [sys.executable, "-c",
          ENTRY_SNIPPET.format(entry=os.path.join(REPO, "__spark_entry__.py"))],
         "/tmp"),
        ("selfcheck", [sys.executable, os.path.join(TOOLS, "selfcheck.py"), sf], None),
    ]
    if not a.fast:
        # the whole oracle gate under the simulated Spark Connect
        # surface (sparkContext/.rdd raise for non-pyspark frames) —
        # Connect-cleanliness proven suite-wide, not just on the
        # 4-path smoke subset (r10 VERDICT item 1)
        stages.append(("selfcheck-connect-sim",
                       [sys.executable, os.path.join(TOOLS, "selfcheck.py"), sf],
                       None, {"SELFCHECK_CONNECT_SIM": "1"}))
    if a.fast:
        # --meta (r12): the fuzzer's own mutation canaries — any change
        # under tools/ must prove the differential gate still trips on
        # injected bugs BEFORE the snapshot; full mode covers these via
        # the pytest stage. The r11 spans-grammar commit shipped without
        # this and landed a red canary at HEAD.
        stages.append(("meta-canaries",
                       [sys.executable, "-m", "pytest", "-q",
                        "tests/test_fuzzcheck.py::test_generator_is_deterministic",
                        "tests/test_fuzzcheck.py::test_sql_renderer_parses_in_duckdb",
                        "tests/test_fuzzcheck.py::test_canaries_survive_grammar_shift",
                        "tests/test_fuzzcheck.py::test_harness_detects_injected_bugs"],
                       None))
    for s in seeds:
        stages.append((f"fuzzcheck-seed{s}",
                       [sys.executable, os.path.join(TOOLS, "fuzzcheck.py"),
                        "--n", str(n), "--seed", str(s), "--sf", sf], None))
    if not a.fast:
        # r9 dimensions: ANSI-off differential (every pipeline re-run
        # under spark.sql.ansi.enabled=false, identical rows) and
        # randomized twin-agreement for the 5 no-oracle rows
        stages.append(("fuzzcheck-ansi",
                       [sys.executable, os.path.join(TOOLS, "fuzzcheck.py"),
                        "--n", "100", "--ansi", "--seed", "55", "--sf", sf], None))
        stages.append(("twinfuzz",
                       [sys.executable, os.path.join(TOOLS, "fuzzcheck.py"),
                        "--twins", "25", "--seed", "55", "--sf", sf], None))
        # partition-invariance differential (r9): each pipeline re-run
        # under shuffle.partitions=1/AQE-off and =37/AQE-on — output
        # must not depend on partition count (the first thing that
        # changes on a real cluster)
        stages.append(("fuzzcheck-partitions",
                       [sys.executable, os.path.join(TOOLS, "fuzzcheck.py"),
                        "--n", "60", "--partitions", "--seed", "56",
                        "--sf", sf], None))
    # stateful streaming differential (dropDuplicatesWithinWatermark +
    # update-mode aggregation + stream-stream join + session-window
    # aggregation + randomized stateful processors vs batch/replay)
    # — 52 specs full, 12 fast
    nd, na, nj, ns, nst, niv, nivpq, nsp = ((3, 3, 2, 2, 2, 2, 2, 2) if a.fast
                                            else (12, 12, 10, 10, 8, 6, 5, 5))
    stages.append(("streamfuzz",
                   [sys.executable, os.path.join(TOOLS, "streamfuzz.py"),
                    "--n-dedup", str(nd), "--n-agg", str(na),
                    "--n-join", str(nj), "--n-session", str(ns),
                    "--n-stateful", str(nst), "--n-ivf", str(niv),
                    "--n-ivfpq", str(nivpq), "--n-spans", str(nsp),
                    "--sf", sf], None))
    # config-layer negative-path fuzz (no Spark, ~2s): mutated conf
    # text / parsed dicts must fail typed, never with a raw traceback
    stages.append(("hoconfuzz",
                   [sys.executable, os.path.join(TOOLS, "hoconfuzz.py"),
                    "--n", "600" if a.fast else "2000"], None))
    if not a.fast:
        # planted-skew layout invariance (r11): random hot LSH bands /
        # hot IVF cells; results must be identical between
        # partitions=1/AQE-off and 32/AQE-on (skew handling may only
        # ever change the plan, never the answer)
        # --aqe (r12): AQE's OptimizeSkewedJoin must actually FIRE on
        # the planted hot band (engagement thresholds), return the
        # identical pair set, and stay within the stress wall budget
        stages.append(("skewfuzz",
                       [sys.executable, os.path.join(TOOLS, "skewcheck.py"),
                        "--skip-stress", "--aqe", "--fuzz", "3",
                        "--sf-fuzz", sf, "--seed", "57"], None))
    # per-query sf1 regression budgets vs the committed bench artifact
    # (instant JSON check; fails only on a clean-run violation)
    stages.append(("sf1-budget-gate",
                   [sys.executable, os.path.join(TOOLS, "sf1_budget_gate.py")],
                   None))
    if not a.fast:
        # the whole suite over 0-row tables, oracle-compared (declared
        # divergences asserted) — ANSI-mode empty-input robustness
        stages.append(("emptycheck",
                       [sys.executable, os.path.join(TOOLS, "emptycheck.py")],
                       None))
    if not (a.fast or a.skip_pytest):
        stages.append(("pytest", [sys.executable, "-m", "pytest", "tests/", "-q"], None))

    failed = [st[0] for st in stages if not run(*st)]
    print(f"\n{'ALL PASS' if not failed else 'FAILED: ' + ', '.join(failed)}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
