"""Artifact-provenance tests for tools/sf1_budget_gate.py (r8 VERDICT
item 2): the gate must never bless a steal-contaminated artifact with
exit 0 — it either gates a clean fallback snapshot or fails loud."""

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

from sf1_budget_gate import main  # noqa: E402


def _artifact(tmp_path, name, *, sf01=0.5, sf1_w=2.0, steal=0.0, measured=100.0,
              flagged=False):
    d = {
        "queries": {"q_x": sf01},
        "sf1": {"replication": 10, "queries": {"q_x": sf1_w},
                "steal_sec": steal, "measured_sec": measured},
    }
    if flagged:
        d["steal_contaminated"] = True
    p = tmp_path / name
    p.write_text(json.dumps(d))
    return str(p)


def _budgets(tmp_path, alpha=0.5):
    p = tmp_path / "budgets.json"
    p.write_text(json.dumps({"alpha": {"q_x": alpha}}))
    return str(p)


def test_clean_within_budget_passes(tmp_path, capsys):
    src = _artifact(tmp_path, "a.json", sf01=0.5, sf1_w=2.0)  # limit 0.5*10*0.5+1=3.5
    assert main([src, "--budgets", _budgets(tmp_path), "--fallback", "none"]) == 0
    assert "1 queries within budget" in capsys.readouterr().out


def test_clean_violation_fails(tmp_path, capsys):
    src = _artifact(tmp_path, "a.json", sf01=0.5, sf1_w=9.0)  # > 3.5s limit
    assert main([src, "--budgets", _budgets(tmp_path), "--fallback", "none"]) == 1
    assert "VIOLATION q_x" in capsys.readouterr().out


def test_contaminated_src_uses_clean_fallback(tmp_path, capsys):
    # working tree flagged; committed snapshot clean and within budget
    src = _artifact(tmp_path, "dirty.json", sf1_w=9.0, flagged=True)
    fb = _artifact(tmp_path, "head.json", sf1_w=2.0)
    assert main([src, "--budgets", _budgets(tmp_path), "--fallback", fb]) == 0
    out = capsys.readouterr().out
    assert "STEAL-CONTAMINATED" in out and "head.json" in out


def test_contaminated_src_violating_fallback_fails(tmp_path, capsys):
    # the fallback is clean but over budget — a real regression fails
    src = _artifact(tmp_path, "dirty.json", flagged=True)
    fb = _artifact(tmp_path, "head.json", sf1_w=9.0)
    assert main([src, "--budgets", _budgets(tmp_path), "--fallback", fb]) == 1


def test_both_contaminated_fails_loud(tmp_path, capsys):
    src = _artifact(tmp_path, "dirty.json", flagged=True)
    fb = _artifact(tmp_path, "head.json", steal=80.0, measured=100.0)  # >50% steal
    assert main([src, "--budgets", _budgets(tmp_path), "--fallback", fb]) == 1
    out = capsys.readouterr().out
    assert "both" in out and "quiet host" in out


def test_contaminated_no_fallback_fails_loud(tmp_path, capsys):
    src = _artifact(tmp_path, "dirty.json", flagged=True)
    assert main([src, "--budgets", _budgets(tmp_path), "--fallback", "none"]) == 1
    assert "no clean artifact" in capsys.readouterr().out


def test_implicit_steal_ratio_triggers_contamination(tmp_path, capsys):
    # not flagged, but sf1 steal > 50% of measured — same treatment
    src = _artifact(tmp_path, "a.json", steal=60.0, measured=100.0)
    assert main([src, "--budgets", _budgets(tmp_path), "--fallback", "none"]) == 1
