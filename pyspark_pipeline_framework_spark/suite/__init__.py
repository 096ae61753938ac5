"""Correctness suite — the driver contract implementation.

Every operator from SURVEY.md §2 registers here as a named
:class:`Case`: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus
(where SQL-expressible) an equivalent DuckDB oracle SQL string. The
root ``__spark_entry__.py`` re-exports this registry as
``queries()`` / ``oracle_sql()``.

Determinism rule used throughout (SURVEY.md §7 risk register, float
nondeterminism): every double-typed aggregate is computed as
``CAST(SUM(CAST(expr AS DECIMAL(38,6))) AS DOUBLE)`` in BOTH engines —
decimal sums are exact and order-independent, so Spark and DuckDB agree
bit-for-bit regardless of partitioning / shuffle order.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkCase = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Case:
    name: str
    spark_fn: SparkCase
    oracle: str | None  # DuckDB SQL; None -> rows-only check
    category: str


_CASES: dict[str, Case] = {}


def case(name: str, oracle: str | None = None, category: str = "relational"):
    """Register a correctness case. Column names/aliases MUST match
    between the Spark DataFrame and the oracle SQL (driver hashes
    values under name-sorted columns)."""

    def deco(fn: SparkCase) -> SparkCase:
        if name in _CASES:
            raise ValueError(f"duplicate case {name!r}")
        _CASES[name] = Case(name, fn, oracle, category)
        return fn

    return deco


def all_cases() -> dict[str, Case]:
    _load_all()
    return dict(_CASES)


def queries() -> dict[str, SparkCase]:
    return {n: c.spark_fn for n, c in all_cases().items()}


def oracle_sql() -> dict[str, str]:
    return {n: c.oracle for n, c in all_cases().items() if c.oracle is not None}


_LOADED = False


def _load_all() -> None:
    """Import every suite module (registration side effects)."""
    global _LOADED
    if _LOADED:
        return
    from pyspark_pipeline_framework_spark.suite import (  # noqa: F401
        aggregates,
        compose,
        dq,
        events,
        functions,
        io_cases,
        joins,
        llm,
        relational,
        relational2,
        relational3,
        setops,
        tpch,
        tpch2,
        tpch3,
        udfs,
        windows,
    )
    _LOADED = True
