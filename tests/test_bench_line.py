"""Bench stdout-line contract (r12 VERDICT item 2): which queries appear
on the ONE JSON line is pinned by tools/bench_line_names.json, never by
the run's timings, so the driver's cross-round differ can never mistake
byte-budget truncation for dropped queries; truncation, when forced, is
counted in an explicit "omitted" field."""

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

import bench  # noqa: E402
from sf1_budget_gate import main as gate_main  # noqa: E402


def _line(timings, pinned, budget=1950):
    obj = {"metric": "suite_total_sec", "value": round(sum(timings.values()), 4),
           "unit": "sec", "n_queries": len(timings), "sf": 0.1, "queries": {}}
    bench._fill_line_queries(obj, timings, pinned, budget=budget)
    return obj


def test_line_membership_is_timing_independent():
    timings_fast = {f"q_{i:03d}": 0.1 + i / 100 for i in range(150)}
    timings_slow = {n: v * 7 for n, v in timings_fast.items()}
    pinned = [f"q_{i:03d}" for i in range(0, 150, 3)]
    a = _line(timings_fast, pinned)
    b = _line(timings_slow, pinned)
    assert set(a["queries"]) == set(pinned)
    assert set(b["queries"]) == set(pinned)
    assert a["omitted"] == b["omitted"] == 150 - len(pinned)


def test_real_pin_file_fits_the_driver_tail_budget():
    pinned = json.loads((REPO / "tools" / "bench_line_names.json").read_text())["names"]
    full = json.loads((REPO / "BENCH_FULL.json").read_text())["queries"]
    # every pinned name must exist in the suite artifact and fit even when
    # every timing is 5x slower (the driver's low-core scaling run)
    obj = {"metric": "suite_total_sec", "value": 9999.9999, "unit": "sec",
           "n_queries": len(full), "sf": 0.1, "calib_sec": 0.2389,
           "steal_sec": 99999.9, "steal_capacity_pct": 99.99,
           "queries_full": "BENCH_FULL.json", "steal_contaminated": True,
           "sf1": {"n": 165, "total_sec": 9999.99, "superlinear": [],
                   "budget_violations": []},
           "queries": {}}
    bench._fill_line_queries(obj, {n: v * 5 for n, v in full.items()}, pinned)
    assert set(obj["queries"]) == set(pinned), "pin set must fit without eviction"
    assert len(json.dumps(obj, separators=(",", ":"))) <= 1950
    assert obj["omitted"] == len(full) - len(pinned)


def test_overflow_is_counted_not_silent():
    timings = {f"q_very_long_query_name_{i:04d}": float(i) for i in range(200)}
    obj = _line(timings, sorted(timings), budget=500)
    assert obj["omitted"] == len(timings) - len(obj["queries"]) > 0
    # slowest pinned entries survive the eviction
    kept = set(obj["queries"])
    dropped = set(timings) - kept
    assert max(timings[n] for n in dropped) <= min(timings[n] for n in kept)


def test_no_pin_file_falls_back_to_slowest_first():
    timings = {f"q_{i:02d}": float(i) for i in range(30)}
    obj = _line(timings, [], budget=400)
    kept = set(obj["queries"])
    dropped = set(timings) - kept
    assert kept and dropped
    assert max(timings[n] for n in dropped) <= min(timings[n] for n in kept)


def test_gate_skips_off_reference_core_count(tmp_path, capsys):
    budgets = tmp_path / "budgets.json"
    budgets.write_text(json.dumps(
        {"alpha": {"q_x": 0.3}, "source": {"pinned_cpus": 32}}))
    art = tmp_path / "full.json"
    # 8-core artifact violating the 32-core alpha: must SKIP, not flag
    art.write_text(json.dumps({
        "cpus": 8, "queries": {"q_x": 0.5},
        "sf1": {"replication": 10, "queries": {"q_x": 9.0},
                "steal_sec": 0.0, "measured_sec": 100.0}}))
    assert gate_main([str(art), "--budgets", str(budgets),
                      "--fallback", "none"]) == 0
    assert "core" in capsys.readouterr().out.lower()


def test_gate_still_checks_on_reference_core_count(tmp_path, capsys):
    budgets = tmp_path / "budgets.json"
    budgets.write_text(json.dumps(
        {"alpha": {"q_x": 0.3}, "source": {"pinned_cpus": 32}}))
    art = tmp_path / "full.json"
    art.write_text(json.dumps({
        "cpus": 32, "queries": {"q_x": 0.5},
        "sf1": {"replication": 10, "queries": {"q_x": 9.0},
                "steal_sec": 0.0, "measured_sec": 100.0}}))
    assert gate_main([str(art), "--budgets", str(budgets),
                      "--fallback", "none"]) == 1
    assert "VIOLATION q_x" in capsys.readouterr().out
