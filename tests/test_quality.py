"""Quality checks + gate against an engineered fixture (reference
fixture A2 shape, FIXTURES.md: nulls + duplicate + range violation)."""

import pytest

from pyspark_pipeline_framework_spark.quality.checks import (
    CheckSeverity,
    CheckTiming,
    custom_sql_check,
    null_check,
    range_check,
    row_count_check,
    schema_check,
    unique_check,
)
from pyspark_pipeline_framework_spark.quality.gate import QualityGate, QualityGateError


@pytest.fixture(scope="module")
def dq_df(spark):
    return spark.createDataFrame(
        [
            (1, "Alice", 25, 85.0),
            (2, "Bob", 30, 92.5),
            (3, "Alice", 35, 78.0),
            (4, None, 40, None),
        ],
        "id long, name string, age long, score double",
    )


def test_row_count(dq_df):
    assert row_count_check("t", 4).run(dq_df).passed
    assert not row_count_check("t", 5).run(dq_df).passed


def test_null_pct(dq_df):
    r = null_check("t", "name", max_null_pct=25.0).run(dq_df)
    assert r.passed and r.metric == 25.0
    assert not null_check("t", "name", max_null_pct=10.0).run(dq_df).passed
    assert null_check("t", "id").run(dq_df).passed


def test_checks_on_empty_dataset(dq_df):
    """An empty dataset is a legitimate DQ scenario and must not abort
    the pipeline: under Spark 4's default ANSI mode the unguarded
    null-pct division threw DIVIDE_BY_ZERO (regression, r6). Semantics:
    no rows → 0% nulls / 0 duplicates / 0 violations (all pass);
    row_count with min>0 fails."""
    empty = dq_df.filter("id < 0")
    for chk in (
        null_check("t", "name", max_null_pct=5.0),
        unique_check("t", ["id"]),
        range_check("t", "score", min_value=0.0, max_value=100.0),
    ):
        r = chk.run(empty)
        assert r.passed and r.metric == 0.0, r
    r = row_count_check("t", 10).run(empty)
    assert not r.passed and r.metric == 0.0


def test_unique(dq_df):
    assert unique_check("t", ["id"]).run(dq_df).passed
    r = unique_check("t", ["name"]).run(dq_df)
    assert not r.passed and r.metric == 1.0  # one extra 'Alice'


def test_range(dq_df):
    assert range_check("t", "age", 20, 50).run(dq_df).passed
    r = range_check("t", "age", 30, 50).run(dq_df)
    assert not r.passed and r.metric == 1.0
    with pytest.raises(ValueError):
        range_check("t", "age")


def test_schema(dq_df):
    ok = schema_check("t", {"id": "bigint", "name": "string"}).run(dq_df)
    assert ok.passed
    bad = schema_check("t", {"id": "int", "ghost": "string"}).run(dq_df)
    assert not bad.passed and bad.metric == 2.0


def test_custom_sql(spark, dq_df):
    dq_df.createOrReplaceTempView("dq_fixture")
    ok = custom_sql_check(
        "t", spark, "SELECT COUNT(*) = 4 AS passed, 'rows' AS message FROM dq_fixture"
    ).run(dq_df)
    assert ok.passed


def test_gate_fail_on_error(dq_df):
    gate = QualityGate([unique_check("t", ["name"])])
    with pytest.raises(QualityGateError):
        gate.run(CheckTiming.AFTER_COMPONENT, {"t": dq_df}, component_output="t")


def test_gate_warn_only_passes(dq_df):
    gate = QualityGate([unique_check("t", ["name"], severity=CheckSeverity.WARN_ONLY)])
    results = gate.run(CheckTiming.AFTER_COMPONENT, {"t": dq_df}, component_output="t")
    assert len(results) == 1 and not results[0].passed


def test_gate_threshold(dq_df):
    checks = [
        unique_check("t", ["name"], severity=CheckSeverity.THRESHOLD),
        null_check("t", "score", 0.0, severity=CheckSeverity.THRESHOLD),
    ]
    assert QualityGate(checks, max_failures=2).run(CheckTiming.AFTER_COMPONENT, {"t": dq_df}, component_output="t")
    with pytest.raises(QualityGateError):
        QualityGate(checks, max_failures=1).run(CheckTiming.AFTER_COMPONENT, {"t": dq_df}, component_output="t")


def test_gate_timing_filter(dq_df):
    gate = QualityGate([row_count_check("t", 1, timing=CheckTiming.BEFORE_PIPELINE)])
    assert gate.run(CheckTiming.AFTER_COMPONENT, {"t": dq_df}, component_output="t") == []
    assert len(gate.run(CheckTiming.BEFORE_PIPELINE, {"t": dq_df})) == 1


def test_gate_scopes_after_component_checks(dq_df):
    """An AFTER_COMPONENT check runs once, for the component that
    produced its dataset (or that it names) — not after every
    component."""
    gate = QualityGate(
        [
            row_count_check("t", 1),
            row_count_check("t", 1, component_name="loader"),
        ]
    )
    # unrelated component: neither the dataset producer nor "loader"
    assert (
        gate.run(
            CheckTiming.AFTER_COMPONENT, {"t": dq_df},
            component_name="other", component_output="u",
        )
        == []
    )
    # producer of "t": unscoped check fires, name-scoped does not
    r = gate.run(
        CheckTiming.AFTER_COMPONENT, {"t": dq_df},
        component_name="maker", component_output="t",
    )
    assert [x.check_name for x in r] == ["row_count[t]"]
    # the named component: name-scoped check fires regardless of output
    r = gate.run(
        CheckTiming.AFTER_COMPONENT, {"t": dq_df},
        component_name="loader", component_output="z",
    )
    assert [x.check_name for x in r] == ["row_count[t]"]
