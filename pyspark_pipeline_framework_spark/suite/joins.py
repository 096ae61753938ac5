"""Join cases — SURVEY.md §2.5 join rows (q_join_*).

Outer/semi/anti/theta map to ``DataFrame.join`` modes; as-of and range
joins use the shuffle-bounded operators in ``operators.joins``
(no native Spark support — oracles use DuckDB ASOF JOIN / interval
join directly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_pipeline_framework_spark.io.readers import table
from pyspark_pipeline_framework_spark.operators.joins import asof_join, range_join
from pyspark_pipeline_framework_spark.suite import case


@case(
    "q_join_left",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_orderstatus = 'O'
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(
        o, (c.c_custkey == o.o_custkey) & (o.o_orderstatus == "O"), "left"
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@case(
    "q_join_right",
    oracle="""
    SELECT o.o_orderkey, c.c_custkey, c.c_mktsegment
    FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "o_orderkey", "c_custkey", "c_mktsegment"
    )


@case(
    "q_join_full",
    oracle="""
    WITH cust AS (
      SELECT c_nationkey AS nationkey, CAST(COUNT(*) AS BIGINT) AS n_cust
      FROM customer GROUP BY 1
    ), supp AS (
      SELECT s_nationkey AS nationkey, CAST(COUNT(*) AS BIGINT) AS n_supp
      FROM supplier GROUP BY 1
    )
    SELECT COALESCE(cust.nationkey, supp.nationkey) AS nationkey,
           cust.n_cust, supp.n_supp
    FROM cust FULL JOIN supp ON cust.nationkey = supp.nationkey
    """,
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    supp = (
        table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return cust.join(supp, "nationkey", "full").select(
        F.col("nationkey"), "n_cust", "n_supp"
    )


@case(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@case(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@case(
    "q_join_theta",
    oracle="""
    SELECT s.s_suppkey, c.c_custkey
    FROM supplier s JOIN customer c
      ON s.s_nationkey = c.c_nationkey AND c.c_acctbal > s.s_acctbal
    """,
)
def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    # theta = equi key + inequality residual: Catalyst still plans an
    # equi-join on nationkey (scalable), the inequality is a post-filter —
    # the 100 TB-safe way to spell a non-equi join when any equi key exists.
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    return s.join(
        c, (s.s_nationkey == c.c_nationkey) & (c.c_acctbal > s.s_acctbal)
    ).select("s_suppkey", "c_custkey")


@case(
    "q_join_asof",
    oracle="""
    SELECT e.event_id, e.user_id, e.ts, o.order_price
    FROM events e ASOF JOIN (
        SELECT o_custkey, o_orderdate,
               CAST(MAX(o_totalprice) AS DOUBLE) AS order_price
        FROM orders GROUP BY o_custkey, o_orderdate
    ) o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    # nearest-earlier order per event; right side pre-aggregated to be
    # unique per (key, ts) so the carried value is deterministic
    e = table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_totalprice").alias("order_price"))
        .withColumnRenamed("o_custkey", "user_id")
    )
    return asof_join(
        e, o, key="user_id", left_ts="ts", right_ts="o_orderdate",
        right_values=["order_price"], how="inner",
    ).select("event_id", "user_id", "ts", "order_price")


@case(
    "q_join_range",
    oracle="""
    SELECT a.event_id, CAST(COUNT(*) AS BIGINT) AS n_following
    FROM events a JOIN events b
      ON b.ts > a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE
    GROUP BY a.event_id
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    # events following each event within 5 minutes — bucketized interval
    # join (operators.joins.range_join), never a BNLJ
    ev = table(spark, sf_dir, "events")
    left = ev.select("event_id", "ts")
    right = ev.select(F.col("ts").alias("r_ts"))
    joined = range_join(
        left, right, left_ts="ts", right_ts="r_ts",
        lower="0 SECOND", upper="5 MINUTE", bucket_seconds=300,
    )
    return joined.groupBy("event_id").agg(F.count(F.lit(1)).alias("n_following"))
