"""Data-quality check operators.

Capability parity with the reference's six factory checks
(core/quality/checks.py:14-308 — row_count / null / unique / range /
schema / custom_sql) re-expressed Spark-first: every check builds a
LAZY one-row metrics DataFrame (``metric_df``), so a QualityGate can
compose many checks into few jobs, and the driver's oracle can verify
the metric computation itself (suite ``q_dq_*`` cases).

Scale notes: each metric is a single full-scan aggregate (count-shaped,
map-side combined). unique_check counts duplicate KEYS via one groupBy
rather than ``distinct().count()`` + ``count()`` double-scan.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckTiming(enum.Enum):
    BEFORE_PIPELINE = "before_pipeline"
    AFTER_COMPONENT = "after_component"
    AFTER_PIPELINE = "after_pipeline"


class CheckSeverity(enum.Enum):
    FAIL_ON_ERROR = "fail_on_error"
    WARN_ONLY = "warn_only"
    THRESHOLD = "threshold"


@dataclass(frozen=True)
class CheckResult:
    check_name: str
    dataset: str
    passed: bool
    metric: float
    detail: str = ""


@dataclass
class DataQualityCheck:
    """A named check over a dataset: ``metric_df`` builds the lazy
    metrics frame; ``evaluate`` interprets its single row."""

    name: str
    dataset: str
    metric_df: Callable[[DataFrame], DataFrame]
    evaluate: Callable[[dict], tuple[bool, float, str]]
    timing: CheckTiming = CheckTiming.AFTER_COMPONENT
    severity: CheckSeverity = CheckSeverity.FAIL_ON_ERROR
    # AFTER_COMPONENT checks run only after THIS component (reference
    # runner/quality_hooks.py skips non-matching component names); when
    # None, the check binds to whichever component OUTPUTS its dataset
    component_name: str | None = None

    def run(self, df: DataFrame) -> CheckResult:
        row = self.metric_df(df).head()
        passed, metric, detail = self.evaluate(row.asDict() if row else {})
        return CheckResult(self.name, self.dataset, passed, metric, detail)


def row_count_check(dataset: str, min_rows: int, **kw) -> DataQualityCheck:
    def mdf(df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_rows"))

    def ev(row: dict):
        n = row.get("n_rows", 0)
        return n >= min_rows, float(n), f"rows={n} min={min_rows}"

    return DataQualityCheck(f"row_count[{dataset}]", dataset, mdf, ev, **kw)


def null_check(dataset: str, column: str, max_null_pct: float = 0.0, **kw) -> DataQualityCheck:
    def mdf(df: DataFrame) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(column).alias("n_non_null"),
        ).select(
            "n_rows",
            # empty dataset → 0% nulls (passes): no rows have nulls.
            # The explicit guard matters under Spark 4's default ANSI
            # mode, where the bare division throws DIVIDE_BY_ZERO and
            # would abort the whole pipeline on a legitimately-empty
            # dataset (found by the r6 DQ fuzz differential).
            F.when(F.col("n_rows") == 0, F.lit(0.0))
            .otherwise(
                (F.col("n_rows") - F.col("n_non_null")) * 100.0 / F.col("n_rows")
            )
            .alias("null_pct"),
        )

    def ev(row: dict):
        pct = row.get("null_pct") or 0.0
        return pct <= max_null_pct, pct, f"null%={pct:.3f} max={max_null_pct}"

    return DataQualityCheck(f"null[{dataset}.{column}]", dataset, mdf, ev, **kw)


def unique_check(dataset: str, columns: list[str], **kw) -> DataQualityCheck:
    def mdf(df: DataFrame) -> DataFrame:
        # one shuffle: count keys with >1 row (not distinct+count twice)
        return (
            df.groupBy(*columns)
            .agg(F.count(F.lit(1)).alias("__n"))
            .agg(
                F.sum(F.when(F.col("__n") > 1, F.col("__n") - 1).otherwise(0)).alias(
                    "n_duplicates"
                )
            )
        )

    def ev(row: dict):
        dups = row.get("n_duplicates") or 0
        return dups == 0, float(dups), f"duplicate rows={dups} on {columns}"

    return DataQualityCheck(f"unique[{dataset}.{','.join(columns)}]", dataset, mdf, ev, **kw)


def range_check(
    dataset: str, column: str, min_value: float | None = None, max_value: float | None = None, **kw
) -> DataQualityCheck:
    if min_value is None and max_value is None:
        raise ValueError("range_check needs min_value and/or max_value")

    def mdf(df: DataFrame) -> DataFrame:
        cond = F.lit(False)
        if min_value is not None:
            cond = cond | (F.col(column) < min_value)
        if max_value is not None:
            cond = cond | (F.col(column) > max_value)
        return df.agg(F.sum(F.when(cond, 1).otherwise(0)).alias("n_violations"))

    def ev(row: dict):
        v = row.get("n_violations") or 0
        return v == 0, float(v), f"out-of-range rows={v} bounds=[{min_value},{max_value}]"

    return DataQualityCheck(f"range[{dataset}.{column}]", dataset, mdf, ev, **kw)


def schema_check(dataset: str, expected: dict[str, str], **kw) -> DataQualityCheck:
    """Expected columns exist with expected Spark simple-type names."""

    def mdf(df: DataFrame) -> DataFrame:
        actual = dict(df.dtypes)
        missing = [c for c in expected if c not in actual]
        mismatched = [
            f"{c}:{actual[c]}!={t}" for c, t in expected.items() if c in actual and actual[c] != t
        ]
        spark = df.sparkSession
        return spark.createDataFrame(
            [(len(missing) + len(mismatched), ",".join(missing + mismatched))],
            "n_problems int, problems string",
        )

    def ev(row: dict):
        n = row.get("n_problems") or 0
        return n == 0, float(n), row.get("problems") or "ok"

    return DataQualityCheck(f"schema[{dataset}]", dataset, mdf, ev, **kw)


def custom_sql_check(
    dataset: str, spark: SparkSession, sql: str, name: str = "custom_sql", **kw
) -> DataQualityCheck:
    """Arbitrary SQL returning one row with a boolean ``passed`` column
    (+ optional ``message``) — the reference's universal escape hatch."""

    def mdf(_: DataFrame) -> DataFrame:
        return spark.sql(sql)

    def ev(row: dict):
        passed = bool(row.get("passed", False))
        return passed, 1.0 if passed else 0.0, str(row.get("message", ""))

    return DataQualityCheck(f"{name}[{dataset}]", dataset, mdf, ev, **kw)
