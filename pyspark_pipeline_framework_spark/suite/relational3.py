"""Third relational pack: map-typed columns, algebraic statistics,
value-range window frames, outer explode."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_pipeline_framework_spark.io.readers import table
from pyspark_pipeline_framework_spark.suite import case
from pyspark_pipeline_framework_spark.suite._util import dsum, o_dsum


@case(
    "q_fn_map",
    oracle="""
    SELECT r_regionkey,
           MAP(['key', 'name'], [CAST(r_regionkey AS VARCHAR), r_name])['name'][1] AS from_map,
           CAST(cardinality(MAP(['key', 'name'], [CAST(r_regionkey AS VARCHAR), r_name])) AS INT) AS map_size
    FROM region
    """,
)
def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = table(spark, sf_dir, "region")
    m = F.map_from_arrays(
        F.array(F.lit("key"), F.lit("name")),
        F.array(F.col("r_regionkey").cast("string"), F.col("r_name")),
    )
    return r.select(
        "r_regionkey",
        F.element_at(m, "name").alias("from_map"),
        F.size(m).alias("map_size"),
    )


@case(
    "q_agg_stats",
    oracle=f"""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           {o_dsum('l_quantity')} AS s1,
           {o_dsum('l_quantity * l_quantity')} AS s2,
           ({o_dsum('l_quantity * l_quantity')} - {o_dsum('l_quantity')} * {o_dsum('l_quantity')} / COUNT(*))
             / (COUNT(*) - 1) AS var_samp_alg,
           SQRT(({o_dsum('l_quantity * l_quantity')} - {o_dsum('l_quantity')} * {o_dsum('l_quantity')} / COUNT(*))
             / (COUNT(*) - 1)) AS stddev_alg
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance/stddev via the algebraic sum-of-squares identity over
    EXACT decimal sums — deterministic and cross-engine identical,
    unlike the built-in streaming (Welford) implementations whose
    float accumulation differs between engines."""
    li = table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    n = F.count(F.lit(1))
    s1 = dsum(q)
    s2 = dsum(q * q)
    var = (s2 - s1 * s1 / n) / (n - 1)
    return li.groupBy("l_returnflag").agg(
        n.alias("n"),
        s1.alias("s1"),
        s2.alias("s2"),
        var.alias("var_samp_alg"),
        F.sqrt(var).alias("stddev_alg"),
    )


@case(
    "q_win_range_frame",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           CAST(COUNT(*) OVER (ORDER BY o_totalprice
                               RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS n_within_1k
    FROM orders
    """,
)
def q_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    # value-range frame: peers defined by o_totalprice distance, so the
    # result is deterministic without a unique tiebreaker. A naive
    # Window.orderBy(...).rangeBetween(-1000, 0) forces Exchange
    # SinglePartition (Spark's "No Partition Defined" warning — one
    # task sorts the whole table at scale); global_range_frame computes
    # identical results with bin-partitioned windows + boundary probes
    # (plan-gated: no SinglePartition, tests/test_explain_plans.py).
    from pyspark_pipeline_framework_spark.operators.windows import global_range_frame

    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return global_range_frame(
        o,
        order_col="o_totalprice",
        lower=-1000,
        upper=0,
        agg="count",
        key_cols=["o_orderkey"],
        result_col="n_within_1k",
    ).select("o_orderkey", "o_totalprice", "n_within_1k")


@case(
    "q_win_range_frame_sum",
    # the sum path of global_range_frame (count path: q_win_range_frame):
    # exact decimal window sum, one final double cast on both engines
    oracle="""
    SELECT o_orderkey, o_totalprice,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
                OVER (ORDER BY o_totalprice
                      RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS sum_within_1k
    FROM orders
    """,
)
def q_win_range_frame_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark_pipeline_framework_spark.operators.windows import global_range_frame

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.col("o_totalprice").cast("decimal(38,6)").alias("_dec_price"),
    )
    out = global_range_frame(
        o,
        order_col="o_totalprice",
        lower=-1000,
        upper=0,
        agg="sum",
        value_col="_dec_price",
        key_cols=["o_orderkey"],
        result_col="_sum_dec",
    )
    return out.select(
        "o_orderkey",
        "o_totalprice",
        F.col("_sum_dec").cast("double").alias("sum_within_1k"),
    )


@case(
    "q_win_range_frame_min",
    # the extremum path of global_range_frame (suffix/prefix-extremum
    # boundary probes instead of cumulative sums) — exact for doubles
    oracle="""
    SELECT o_orderkey, o_totalprice,
           MIN(o_totalprice) OVER (ORDER BY o_totalprice
                                   RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW)
             AS min_within_1k
    FROM orders
    """,
)
def q_win_range_frame_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark_pipeline_framework_spark.operators.windows import global_range_frame

    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return global_range_frame(
        o,
        order_col="o_totalprice",
        lower=-1000,
        upper=0,
        agg="min",
        value_col="o_totalprice",
        key_cols=["o_orderkey"],
        result_col="min_within_1k",
    ).select("o_orderkey", "o_totalprice", "min_within_1k")


@case(
    "q_win_range_frame_lead",
    # LEADING-only frame (excludes the current row): the whole frame
    # can live in one foreign bin — exercises the third probe kind
    # (bin-local range window) of global_range_frame (r9 VERDICT item 5)
    oracle="""
    SELECT o_orderkey, o_totalprice,
           CAST(COUNT(*) OVER (ORDER BY o_totalprice
                               RANGE BETWEEN 500 FOLLOWING AND 1500 FOLLOWING) AS BIGINT)
             AS n_ahead
    FROM orders
    """,
)
def q_win_range_frame_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark_pipeline_framework_spark.operators.windows import global_range_frame

    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return global_range_frame(
        o,
        order_col="o_totalprice",
        lower=500,
        upper=1500,
        agg="count",
        key_cols=["o_orderkey"],
        result_col="n_ahead",
    ).select("o_orderkey", "o_totalprice", "n_ahead")


@case(
    "q_win_range_frame_trail",
    # TRAILING-only sum (excludes the current row): empty frames must
    # stay NULL (SQL SUM over nothing), exact decimal accumulation
    oracle="""
    SELECT o_orderkey, o_totalprice,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
                OVER (ORDER BY o_totalprice
                      RANGE BETWEEN 1500 PRECEDING AND 500 PRECEDING) AS DOUBLE)
             AS sum_behind
    FROM orders
    """,
)
def q_win_range_frame_trail(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark_pipeline_framework_spark.operators.windows import global_range_frame

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.col("o_totalprice").cast("decimal(38,6)").alias("_dec_price"),
    )
    out = global_range_frame(
        o,
        order_col="o_totalprice",
        lower=-1500,
        upper=-500,
        agg="sum",
        value_col="_dec_price",
        key_cols=["o_orderkey"],
        result_col="_sum_dec",
    )
    return out.select(
        "o_orderkey",
        "o_totalprice",
        F.col("_sum_dec").cast("double").alias("sum_behind"),
    )


@case(
    "q_win_range_frame_avg",
    # the native FUSED avg path (one binning, one probe union, sum and
    # count channels in the same window pass): deterministic
    # cross-engine avg = CAST(exact decimal sum AS DOUBLE) / count
    oracle="""
    SELECT o_orderkey, o_totalprice,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
                OVER (ORDER BY o_totalprice
                      RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / COUNT(o_totalprice)
                OVER (ORDER BY o_totalprice
                      RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW)
             AS avg_within_1k
    FROM orders
    """,
)
def q_win_range_frame_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark_pipeline_framework_spark.operators.windows import global_range_frame

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.col("o_totalprice").cast("decimal(38,6)").alias("_dec_price"),
    )
    return global_range_frame(
        o,
        order_col="o_totalprice",
        lower=-1000,
        upper=0,
        agg="avg",
        value_col="_dec_price",
        key_cols=["o_orderkey"],
        result_col="avg_within_1k",
    ).select("o_orderkey", "o_totalprice", "avg_within_1k")


@case(
    "q_explode_outer",
    oracle="""
    SELECT c_custkey, word
    FROM (
      SELECT c_custkey,
             CASE WHEN c_mktsegment = 'BUILDING' THEN NULL
                  ELSE string_split(c_mktsegment, 'A') END AS parts
      FROM customer
    ) LEFT JOIN LATERAL unnest(COALESCE(parts, [NULL])) AS t(word) ON TRUE
    """,
)
def q_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    # explode_outer keeps rows whose array is NULL (emitting NULL) —
    # the LEFT JOIN LATERAL unnest(COALESCE(..., [NULL])) oracle mirrors it
    c = table(spark, sf_dir, "customer")
    parts = F.when(F.col("c_mktsegment") == "BUILDING", F.lit(None)).otherwise(
        F.split("c_mktsegment", "A")
    )
    return c.select("c_custkey", F.explode_outer(parts).alias("word"))


@case(
    "q_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt: `DataFrame.unpivot` is a zero-shuffle generator
    (each input row emits one row per measure map-side)."""
    return (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")
        .unpivot(
            ids=["l_orderkey", "l_linenumber"],
            values=["l_quantity", "l_extendedprice", "l_discount"],
            variableColumnName="metric",
            valueColumnName="value",
        )
    )
