"""Data-quality check cases — SURVEY.md §2.4 (the reference's own
operator set). Each case returns the check's lazy metrics frame so the
oracle verifies the metric computation itself."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_pipeline_framework_spark.io.readers import table
from pyspark_pipeline_framework_spark.quality.checks import (
    null_check,
    range_check,
    row_count_check,
    unique_check,
)
from pyspark_pipeline_framework_spark.suite import case


@case(
    "q_dq_rowcount",
    oracle="SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM orders",
)
def q_dq_rowcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    check = row_count_check("orders", min_rows=1)
    return check.metric_df(table(spark, sf_dir, "orders"))


@case(
    "q_dq_nullpct",
    # CASE mirrors the product's empty-input guard (0 rows → 0% nulls,
    # quality/checks.py null_check) so the oracle also holds on an
    # empty `orders` (r6 empty-input sweep)
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CASE WHEN COUNT(*) = 0 THEN 0.0
                ELSE (COUNT(*) - COUNT(o_orderpriority)) * 100.0 / COUNT(*)
           END AS null_pct
    FROM orders
    """,
)
def q_dq_nullpct(spark: SparkSession, sf_dir: str) -> DataFrame:
    check = null_check("orders", "o_orderpriority", max_null_pct=5.0)
    return check.metric_df(table(spark, sf_dir, "orders"))


@case(
    "q_dq_unique",
    oracle="""
    SELECT CAST(SUM(CASE WHEN n > 1 THEN n - 1 ELSE 0 END) AS BIGINT) AS n_duplicates
    FROM (SELECT l_orderkey, l_linenumber, COUNT(*) AS n
          FROM lineitem GROUP BY 1, 2)
    """,
)
def q_dq_unique(spark: SparkSession, sf_dir: str) -> DataFrame:
    check = unique_check("lineitem", ["l_orderkey", "l_linenumber"])
    return check.metric_df(table(spark, sf_dir, "lineitem"))


@case(
    "q_dq_range",
    oracle="""
    SELECT CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_violations
    FROM lineitem
    """,
)
def q_dq_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    check = range_check("lineitem", "l_discount", min_value=0.0, max_value=0.1)
    return check.metric_df(table(spark, sf_dir, "lineitem"))


@case(
    "q_dq_custom_sql",
    oracle="""
    SELECT (COUNT(*) = COUNT(DISTINCT o_orderkey)) AS passed,
           'orderkey uniqueness' AS message
    FROM orders
    """,
)
def q_dq_custom_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the reference's escape hatch: any SQL with a `passed` column
    table(spark, sf_dir, "orders").createOrReplaceTempView("__dq_orders")
    return spark.sql(
        """
        SELECT (COUNT(*) = COUNT(DISTINCT o_orderkey)) AS passed,
               'orderkey uniqueness' AS message
        FROM __dq_orders
        """
    )
