"""Set-operation cases — SURVEY.md §2.5 set-op row.

unionByName / distinct / intersect / exceptAll / subtract; DuckDB's
UNION [ALL] / INTERSECT / EXCEPT [ALL] are the oracles. INTERSECT and
EXCEPT are distinct-semantics in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_pipeline_framework_spark.io.readers import table
from pyspark_pipeline_framework_spark.suite import case


def _urgent(spark, sf_dir):
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_custkey")
    )


def _big(spark, sf_dir):
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 250000)
        .select("o_orderkey", "o_custkey")
    )


_URGENT_SQL = "SELECT o_orderkey, o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'"
_BIG_SQL = "SELECT o_orderkey, o_custkey FROM orders WHERE o_totalprice > 250000"


@case("q_union_all", oracle=f"{_URGENT_SQL} UNION ALL {_BIG_SQL}")
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _urgent(spark, sf_dir).unionByName(_big(spark, sf_dir))


@case("q_union_distinct", oracle=f"{_URGENT_SQL} UNION {_BIG_SQL}")
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _urgent(spark, sf_dir).unionByName(_big(spark, sf_dir)).distinct()


@case("q_intersect", oracle=f"{_URGENT_SQL} INTERSECT {_BIG_SQL}")
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _urgent(spark, sf_dir).intersect(_big(spark, sf_dir))


@case("q_except", oracle=f"{_URGENT_SQL} EXCEPT {_BIG_SQL}")
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _urgent(spark, sf_dir).subtract(_big(spark, sf_dir))


@case("q_except_all", oracle=f"{_URGENT_SQL} EXCEPT ALL {_BIG_SQL}")
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _urgent(spark, sf_dir).exceptAll(_big(spark, sf_dir))
