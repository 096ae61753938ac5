"""Second relational pack: pivot, subqueries (scalar/correlated), CTE,
distribution window functions, percentiles, bitwise and struct/json
expressions — rounding out SURVEY.md §2.5's implicit SQL surface."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_pipeline_framework_spark.io.readers import table
from pyspark_pipeline_framework_spark.suite import case

_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


@case(
    "q_pivot",
    oracle=f"""
    SELECT c_nationkey,
           {", ".join(f"CAST(SUM(CASE WHEN c_mktsegment = '{s}' THEN 1 END) AS BIGINT) AS {s}" for s in _SEGMENTS)}
    FROM customer GROUP BY c_nationkey
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    # explicit values list: no extra distinct-discovery job, stable cols
    return (
        table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .pivot("c_mktsegment", _SEGMENTS)
        .count()
    )


@case(
    "q_subquery_scalar",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 1.5 * (
      SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)
      FROM orders)
    """,
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("__sq_orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM __sq_orders
        WHERE o_totalprice > 1.5 * (
          SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)
          FROM __sq_orders)
        """
    )


@case(
    "q_subquery_correlated",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey) > 15
    """,
)
def q_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "customer").createOrReplaceTempView("__sq_customer")
    table(spark, sf_dir, "orders").createOrReplaceTempView("__sq_orders2")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM __sq_customer c
        WHERE (SELECT COUNT(*) FROM __sq_orders2 o WHERE o.o_custkey = c.c_custkey) > 15
        """
    )


@case(
    "q_cte",
    oracle="""
    WITH seg_stats AS (
      SELECT c_mktsegment AS seg, CAST(COUNT(*) AS BIGINT) AS n_cust
      FROM customer GROUP BY c_mktsegment
    )
    SELECT a.seg AS seg_a, b.seg AS seg_b, a.n_cust, b.n_cust AS n_cust_b
    FROM seg_stats a JOIN seg_stats b ON a.n_cust < b.n_cust
    """,
)
def q_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "customer").createOrReplaceTempView("__cte_customer")
    return spark.sql(
        """
        WITH seg_stats AS (
          SELECT c_mktsegment AS seg, COUNT(*) AS n_cust
          FROM __cte_customer GROUP BY c_mktsegment
        )
        SELECT a.seg AS seg_a, b.seg AS seg_b, a.n_cust, b.n_cust AS n_cust_b
        FROM seg_stats a JOIN seg_stats b ON a.n_cust < b.n_cust
        """
    )


@case(
    "q_win_distribution",
    oracle="""
    SELECT c_custkey,
           CAST(NTILE(4) OVER w AS INT)  AS quartile,
           PERCENT_RANK() OVER w          AS pct_rank,
           CUME_DIST() OVER w             AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def q_win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@case(
    "q_agg_percentile",
    oracle="""
    SELECT c_mktsegment,
           quantile_cont(c_acctbal, 0.5) AS p50,
           quantile_cont(c_acctbal, 0.9) AS p90,
           MIN(c_acctbal) AS lo, MAX(c_acctbal) AS hi
    FROM customer GROUP BY c_mktsegment
    """,
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact interpolated percentile (sort-based → order-independent)
    return (
        table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.percentile("c_acctbal", 0.5).alias("p50"),
            F.percentile("c_acctbal", 0.9).alias("p90"),
            F.min("c_acctbal").alias("lo"),
            F.max("c_acctbal").alias("hi"),
        )
    )


@case(
    "q_fn_bitwise",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_orderkey & 255 AS BIGINT)      AS key_low,
           CAST(l_orderkey | 15 AS BIGINT)       AS key_or,
           CAST(xor(l_orderkey, 15) AS BIGINT)   AS key_xor,
           CAST(l_linenumber << 2 AS BIGINT)     AS ln_shl,
           CAST(l_orderkey >> 3 AS BIGINT)       AS key_shr
    FROM lineitem
    """,
)
def q_fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    k, ln = F.col("l_orderkey"), F.col("l_linenumber")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        k.bitwiseAND(F.lit(255)).alias("key_low"),
        k.bitwiseOR(F.lit(15)).alias("key_or"),
        k.bitwiseXOR(F.lit(15)).alias("key_xor"),
        F.shiftleft(ln, 2).cast("bigint").alias("ln_shl"),
        F.shiftright(k, 3).alias("key_shr"),
    )


@case(
    "q_fn_struct_json",
    oracle="""
    SELECT r_regionkey,
           to_json(struct_pack(key := r_regionkey, name := r_name)) AS packed,
           struct_pack(key := r_regionkey, name := r_name).name AS unpacked_name
    FROM region
    """,
)
def q_fn_struct_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = table(spark, sf_dir, "region")
    packed = F.struct(F.col("r_regionkey").alias("key"), F.col("r_name").alias("name"))
    return r.select(
        "r_regionkey",
        F.to_json(packed).alias("packed"),
        packed.getField("name").alias("unpacked_name"),
    )
