"""Event-analytics cases over the ``events`` stream table: ordered
funnels and cohort retention — the query shapes a product-analytics
user of the reference would write as SqlTransform SQL
(examples/batch.py:238-293), here as first-class operators.

Both are single-logical-pass shapes: the funnel chains three
min-over-user windows on ONE user_id partitioning (one shuffle, three
sort-free full-partition windows); retention is two aggregations
joined on user_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_pipeline_framework_spark.io.readers import table
from pyspark_pipeline_framework_spark.operators.events import (
    cohort_retention,
    funnel_counts,
)
from pyspark_pipeline_framework_spark.suite import case


@case(
    "q_events_funnel",
    oracle="""
    WITH u AS (
      SELECT user_id, MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t1
      FROM events GROUP BY user_id
    ), v AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN u USING (user_id)
      WHERE e.event_type = 'view' AND u.t1 IS NOT NULL AND e.ts > u.t1
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > v.t2
      GROUP BY e.user_id
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM u WHERE t1 IS NOT NULL) AS n_signup,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_signup_view,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_full_funnel
    """,
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-stage funnel (signup -> later view -> later purchase):
    each stage's timestamp is a conditional MIN over the user's
    partition referencing the previous stage — three chained window
    selects over the SAME unordered user_id partitioning, which
    Catalyst plans as one Exchange + one Window operator stack (no
    re-shuffle between stages). The final count is a 1-row global agg."""
    ev = table(spark, sf_dir, "events")
    return funnel_counts(ev, ["signup", "view", "purchase"]).select(
        F.col("n_step1").alias("n_signup"),
        F.col("n_step2").alias("n_signup_view"),
        F.col("n_step3").alias("n_full_funnel"),
    )


@case(
    "q_events_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort
      FROM events GROUP BY user_id
    )
    SELECT CAST(f.cohort AS TIMESTAMP) AS cohort_week,
           CAST((epoch(date_trunc('week', e.ts)) - epoch(f.cohort)) / 604800 AS INT)
             AS week_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active
    FROM events e JOIN firsts f USING (user_id)
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: cohort = week of the user's first
    event; each (cohort, week_offset) counts distinct active users.
    Week offsets are exact integer arithmetic on epoch seconds of
    week-truncated timestamps (identical in both engines; no interval
    division). Two shuffles: first-event agg on user_id, then the
    cohort/offset distinct-count — the user_id join reuses the first
    agg's partitioning."""
    ev = table(spark, sf_dir, "events")
    return cohort_retention(ev, granularity="week").select(
        F.col("cohort_start").alias("cohort_week"),
        F.col("bucket_offset").alias("week_offset"),
        "n_active",
    )


@case(
    "q_events_funnel4",
    # 4-step funnel with a REPEATED step (second 'view' strictly after
    # the first qualifying one) — exercises the generalized operator's
    # arbitrary-sequence path under the driver gate
    oracle="""
    WITH src AS (SELECT * FROM events),
    s0 AS (SELECT user_id, MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t
           FROM src GROUP BY user_id),
    s1 AS (SELECT e.user_id, MIN(e.ts) AS t FROM src e JOIN s0 p USING (user_id)
           WHERE e.event_type = 'view' AND p.t IS NOT NULL AND e.ts > p.t
           GROUP BY e.user_id),
    s2 AS (SELECT e.user_id, MIN(e.ts) AS t FROM src e JOIN s1 p USING (user_id)
           WHERE e.event_type = 'view' AND p.t IS NOT NULL AND e.ts > p.t
           GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, MIN(e.ts) AS t FROM src e JOIN s2 p USING (user_id)
           WHERE e.event_type = 'purchase' AND p.t IS NOT NULL AND e.ts > p.t
           GROUP BY e.user_id)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s0 WHERE t IS NOT NULL) AS n_step1,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n_step2,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM s2) AS n_step3,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM s3) AS n_step4
    """,
)
def q_events_funnel4(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return funnel_counts(ev, ["signup", "view", "view", "purchase"])


@case(
    "q_events_retention_daily",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('day', MIN(ts)) AS cohort
      FROM events GROUP BY user_id
    )
    SELECT CAST(f.cohort AS TIMESTAMP) AS cohort_start,
           CAST((epoch(date_trunc('day', e.ts)) - epoch(f.cohort)) / 86400 AS INT)
             AS bucket_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active
    FROM events e JOIN firsts f USING (user_id)
    GROUP BY 1, 2
    """,
)
def q_events_retention_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-granularity cohort retention through the generalized
    operator (the weekly case pins granularity='week')."""
    ev = table(spark, sf_dir, "events")
    return cohort_retention(ev, granularity="day")
