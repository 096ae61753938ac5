"""Relational operator cases — SURVEY.md §2.5 checklist.

Each case exercises a first-class operator the reference only reaches
through SQL passthrough (SqlTransform, examples/batch.py:286-293),
re-expressed with the DataFrame API so Catalyst owns the physical plan
(pushdown, broadcast, AQE). Oracle = DuckDB ANSI SQL on the same
parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_pipeline_framework_spark.io.readers import table
from pyspark_pipeline_framework_spark.suite import case
from pyspark_pipeline_framework_spark.suite._util import dsum


# --------------------------------------------------------------------------
# Aggregation: TPC-H-Q1-shaped pricing summary (the flagship query).
# Scan → filter (pushed to parquet) → partial+final hash agg → sort.
# At 100 TB: group-by on 2 low-cardinality keys → map-side partial agg
# collapses ~all rows before the (tiny) shuffle; no skew risk.
# --------------------------------------------------------------------------
@case(
    "q_agg_group",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)      AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST((l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)      AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)      AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q_agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            (dsum("l_quantity") / n).alias("avg_qty"),
            (dsum("l_extendedprice") / n).alias("avg_price"),
            (dsum("l_discount") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# Projection: select / rename / computed columns.
# --------------------------------------------------------------------------
@case(
    "q_project_expr",
    oracle="""
    SELECT o_orderkey AS order_id,
           UPPER(o_orderpriority) AS priority_uc,
           o_totalprice * 0.9 AS discounted,
           CAST(YEAR(o_orderdate) AS INT) AS order_year
    FROM orders
    """,
)
def q_project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_id"),
        F.upper("o_orderpriority").alias("priority_uc"),
        (F.col("o_totalprice") * 0.9).alias("discounted"),
        F.year("o_orderdate").alias("order_year"),
    )


# --------------------------------------------------------------------------
# Filter: and/or/not, IN, BETWEEN, null tests — all pushed to the scan.
# --------------------------------------------------------------------------
@case(
    "q_filter_pred",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal, c_mktsegment
    FROM customer
    WHERE (c_mktsegment IN ('BUILDING', 'AUTOMOBILE') OR c_acctbal BETWEEN 0 AND 1000)
      AND NOT (c_nationkey = 3)
      AND c_name IS NOT NULL
    """,
)
def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.filter(
        (F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")
         | F.col("c_acctbal").between(0, 1000))
        & ~(F.col("c_nationkey") == 3)
        & F.col("c_name").isNotNull()
    ).select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")


# --------------------------------------------------------------------------
# Joins. Fact⋈fact (orders⋈lineitem) shuffles on the join key —
# sort-merge/shuffle-hash picked by Catalyst+AQE; dims are broadcast.
# --------------------------------------------------------------------------
@case(
    "q_join_inner",
    oracle="""
    SELECT o.o_orderkey, o.o_orderdate, l.l_linenumber, l.l_quantity
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderstatus = 'F'
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = table(spark, sf_dir, "lineitem")
    return o.join(li, o.o_orderkey == li.l_orderkey, "inner").select(
        "o_orderkey", "o_orderdate", "l_linenumber", "l_quantity"
    )


@case(
    "q_join_broadcast",
    oracle="""
    SELECT n.n_name, CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS total_bal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    # explicit broadcast of the 25-row dim: no shuffle of the fact side
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"), dsum("c_acctbal").alias("total_bal"))
        .orderBy("n_name")
    )


# --------------------------------------------------------------------------
# Sort / limit: multi-key order + limit. At scale: TakeOrderedAndProject
# (per-partition top-N + driver merge), never a global sort.
# --------------------------------------------------------------------------
@case(
    "q_sort_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
)
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
    )
