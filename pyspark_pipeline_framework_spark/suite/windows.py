"""Window cases — ranking/analytic/frame windows + event-time windows
(SURVEY.md §2.5 window rows, §2.6 tumbling/sliding/session).

Ranking orders always include a unique tiebreaker so row_number is a
total order (value-hash determinism). Event-time windows use
``F.window`` / ``F.session_window`` — the same operators work on
Structured Streaming frames; the oracle re-derives the bucketing in
portable SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_pipeline_framework_spark.io.readers import table
from pyspark_pipeline_framework_spark.operators.windows import (
    event_session_window,
    event_time_window,
    top_k_per_group,
)
from pyspark_pipeline_framework_spark.suite import case
from pyspark_pipeline_framework_spark.suite._util import dsum


@case(
    "q_win_rank",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
           CAST(RANK() OVER w AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return table(spark, sf_dir, "customer").select(
        "c_mktsegment",
        "c_custkey",
        "c_acctbal",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
    )


@case(
    "q_win_analytic",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           LAG(o_totalprice) OVER w AS prev_price,
           LEAD(o_totalprice) OVER w AS next_price,
           FIRST_VALUE(o_totalprice) OVER w AS first_price,
           LAST_VALUE(o_totalprice) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_win_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(wfull).alias("last_price"),
    )


@case(
    "q_win_frame",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6)))
                OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6)))
                OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov3_qty
    FROM lineitem
    """,
)
def q_win_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("l_suppkey").orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    running = w.rowsBetween(Window.unboundedPreceding, 0)
    mov3 = w.rowsBetween(-2, 0)
    qdec = F.col("l_quantity").cast("decimal(38,6)")
    return table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(qdec).over(running).cast("double").alias("running_qty"),
        F.sum(qdec).over(mov3).cast("double").alias("mov3_qty"),
    )


@case(
    "q_topk_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal, CAST(rn AS BIGINT) AS rn FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    ) WHERE rn <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = top_k_per_group(
        table(spark, sf_dir, "customer").select("c_mktsegment", "c_custkey", "c_acctbal"),
        group_by=["c_mktsegment"],
        order_by=[F.col("c_acctbal").desc(), F.col("c_custkey")],
        k=3,
    )
    return out.withColumn("rn", F.col("rn").cast("bigint"))


@case(
    "q_win_tumbling",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS win_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def q_win_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        event_time_window(ev, "ts", "1 day", group_by=["event_type"])
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@case(
    "q_win_sliding",
    oracle="""
    SELECT make_timestamp(((epoch_us(ts) // 43200000000) - k) * 43200000000) AS win_start,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events, UNNEST([0, 1]) AS t(k)
    GROUP BY 1
    """,
)
def q_win_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 1-day window sliding every 12h: each event lands in exactly 2 windows
    ev = table(spark, sf_dir, "events")
    return (
        event_time_window(ev, "ts", "1 day", slide="12 hours")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("win_start"), "n")
    )


@case(
    "q_win_session",
    oracle="""
    WITH dts AS (SELECT DISTINCT user_id, ts FROM events),
    flagged AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM dts
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sessions AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    ), tagged AS (
      SELECT x.user_id, x.ts, x.sid
      FROM events e JOIN sessions x
        ON e.user_id = x.user_id AND e.ts = x.ts
    )
    SELECT user_id, MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM tagged GROUP BY user_id, sid
    """,
)
def q_win_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    # gap-based session windows; Spark's session end = last event + gap.
    # An event at EXACTLY last+gap MERGES into the session (new session
    # only on strict diff > gap — verified empirically; the fuzzer's
    # orders/DAY session shape hits this boundary, ns-precision events
    # never do, which is why the old >= oracle passed here)
    ev = table(spark, sf_dir, "events")
    return (
        event_session_window(ev, "ts", "30 minutes", group_by=["user_id"])
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
        )
    )


@case(
    "q_win_session_days",
    # date-granularity sessionization CONSTANTLY hits the exact-gap
    # boundary (diff == gap) and duplicate-timestamp ties that
    # ns-precision events never exercise — this case exists because the
    # r6 fuzzer's orders/DAY session shape caught both oracle bugs
    # (>= vs > on the boundary; tie-nondeterministic cumsum windows).
    # Boundaries over DISTINCT (key, ts); tied rows join back for counts.
    oracle="""
    WITH dts AS (SELECT DISTINCT o_custkey, o_orderdate FROM orders),
    flagged AS (
      SELECT o_custkey, o_orderdate AS ts,
             CASE WHEN LAG(o_orderdate) OVER w IS NULL
                       OR o_orderdate - LAG(o_orderdate) OVER w > INTERVAL 3 DAY
                  THEN 1 ELSE 0 END AS new_s
      FROM dts
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate)
    ), sessions AS (
      SELECT o_custkey, ts,
             SUM(new_s) OVER (PARTITION BY o_custkey ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    ), tagged AS (
      SELECT x.o_custkey, x.ts, x.sid
      FROM orders o JOIN sessions x
        ON o.o_custkey = x.o_custkey AND o.o_orderdate = x.ts
    )
    SELECT o_custkey, MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 3 DAY AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM tagged GROUP BY o_custkey, sid
    """,
)
def q_win_session_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    # order bursts per customer: orders no more than 3 days apart merge
    # (an order at exactly last+3d still merges — strict > splits)
    o = table(spark, sf_dir, "orders")
    return (
        event_session_window(o, "o_orderdate", "3 days", group_by=["o_custkey"])
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            "o_custkey",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_orders",
        )
    )
