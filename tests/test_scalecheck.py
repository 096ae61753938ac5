"""Unit tests for the scale-stress harness's assertion logic
(tools/scalecheck.py) — the Spark battery itself runs standalone
(`python tools/scalecheck.py`); here we pin the pure-Python bound
checks so a refactor can't silently weaken them."""

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "scalecheck",
    os.path.join(os.path.dirname(__file__), "..", "tools", "scalecheck.py"),
)
scalecheck = importlib.util.module_from_spec(spec)
spec.loader.exec_module(scalecheck)


def _rec(wall, rows=10, shuf=1000, **kw):
    return {"wall_s": wall, "rows": rows, "peak_shuffle_write": shuf, **kw}


def _base(n_pairs=100, rounds=2, n_nodes=500):
    return {
        "op_a": _rec(1.0),
        "cluster_star": _rec(1.0, rounds=rounds, n_nodes=n_nodes),
        "_n_candidate_pairs": n_pairs,
    }


def test_linear_scaling_passes():
    results = {1: _base(), 10: {
        "op_a": _rec(9.0, shuf=9000),
        "cluster_star": _rec(9.0, rounds=3, n_nodes=5000, shuf=9000),
        "_n_candidate_pairs": 1000,
    }}
    assert scalecheck.check_results(results, {1: 1 << 30, 10: (1 << 30) + (1 << 28)}) == []


def test_superlinear_wall_flagged():
    results = {1: _base(), 10: {
        "op_a": _rec(60.0),
        "cluster_star": _rec(1.0, rounds=2, n_nodes=5000),
        "_n_candidate_pairs": 1000,
    }}
    probs = scalecheck.check_results(results, {})
    assert any("op_a@x10" in p and "linear bound" in p for p in probs)


def test_superlinear_shuffle_flagged():
    results = {1: _base(), 10: {
        "op_a": _rec(1.0, shuf=scalecheck.SHUFFLE_CONST + 10 * 2 * 1000 + 1),
        "cluster_star": _rec(1.0, rounds=2, n_nodes=5000),
        "_n_candidate_pairs": 1000,
    }}
    probs = scalecheck.check_results(results, {})
    assert any("shuffle-write" in p for p in probs)


def test_quadratic_pair_growth_flagged():
    results = {1: _base(n_pairs=100), 10: {
        "op_a": _rec(1.0),
        "cluster_star": _rec(1.0, rounds=2, n_nodes=5000),
        "_n_candidate_pairs": 100 * 100,  # N² growth
    }}
    probs = scalecheck.check_results(results, {})
    assert any("super-linear" in p for p in probs)


def test_cc_round_blowup_flagged():
    # 500 nodes → bound ceil(log2(500))+3 = 12
    results = {1: _base(rounds=13)}
    probs = scalecheck.check_results(results, {})
    assert any("rounds" in p for p in probs)


def test_driver_heap_growth_flagged():
    results = {1: _base(), 10: {
        "op_a": _rec(1.0),
        "cluster_star": _rec(1.0, rounds=2, n_nodes=5000),
        "_n_candidate_pairs": 1000,
    }}
    probs = scalecheck.check_results(results, {1: 1 << 30, 10: (1 << 30) + scalecheck.HEAP_GROWTH_LIMIT + 1})
    assert any("used-heap" in p for p in probs)
