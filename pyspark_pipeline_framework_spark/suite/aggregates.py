"""Aggregation + dedup cases — SURVEY.md §2.5 aggregation rows.

groupBy/rollup/cube/groupingSets all lower to partial+final hash
aggregates (map-side combine before the shuffle); distinct counts
shuffle on (key, value). ``q_agg_approx_distinct`` is HLL-based and
nondeterministic vs an exact oracle → registered rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_pipeline_framework_spark.io.readers import table
from pyspark_pipeline_framework_spark.suite import case
from pyspark_pipeline_framework_spark.suite._util import dsum


@case(
    "q_agg_distinct",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM customer GROUP BY c_mktsegment
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@case("q_agg_approx_distinct", oracle=None)  # HLL estimate: rows-only check
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey").alias("approx_parts"))
    )


@case(
    "q_agg_approx_distinct_bound",
    # oracle-gated twin for the HLL estimate: the output carries the
    # EXACT per-group distinct count plus a boolean asserting the HLL
    # estimate landed within its documented default error (rsd=0.05;
    # gate at 3x = 15%). The oracle computes the exact count and
    # expects TRUE — if Spark's sketch ever drifts outside the bound,
    # the boolean flips and the value hash mismatches.
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS approx_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_approx_distinct_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    est = F.approx_count_distinct("l_partkey")
    exact = F.countDistinct("l_partkey").cast("bigint")
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            exact.alias("exact_parts"),
            (F.abs(est - exact) <= 0.15 * exact).alias("approx_ok"),
        )
    )


@case(
    "q_agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n"))
    )


@case(
    "q_agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(dsum("o_totalprice").alias("total"), F.count(F.lit(1)).alias("n"))
    )


@case(
    "q_agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"]], "o_orderstatus", "o_orderpriority"
    ).agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("total"))


@case(
    "q_dedup_exact",
    oracle="""
    SELECT l_orderkey, l_partkey, l_linenumber, l_quantity FROM (
      SELECT l_orderkey, l_partkey, l_linenumber, l_quantity,
             ROW_NUMBER() OVER (PARTITION BY l_orderkey, l_partkey
                                ORDER BY l_linenumber, l_quantity) AS rn
      FROM lineitem
    ) WHERE rn = 1
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # deterministic dedup: keep the FIRST row per key under an explicit
    # total order (dropDuplicates keeps an arbitrary row — fine for
    # semantics, wrong for a value-hash gate)
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_linenumber", "l_quantity"
    )
    # (l_linenumber, l_quantity) makes the order total — duplicate
    # (orderkey, partkey, linenumber) rows exist in the testdata.
    # min(struct) ≡ the previous row_number-over-window + rn=1 filter
    # (struct comparison IS the lexicographic total order), but it
    # aggregates map-side before the exchange and skips the window's
    # full per-partition sort — r13, verified row-identical at sf0.1
    # and ~1.7× faster (guide §2.3: aggregate before you shuffle)
    return (
        li.groupBy("l_orderkey", "l_partkey")
        .agg(F.min(F.struct("l_linenumber", "l_quantity")).alias("__m"))
        .select(
            "l_orderkey",
            "l_partkey",
            F.col("__m.l_linenumber").alias("l_linenumber"),
            F.col("__m.l_quantity").alias("l_quantity"),
        )
    )
