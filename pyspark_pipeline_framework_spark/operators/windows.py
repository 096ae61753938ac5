"""Window / ranking / event-time operators.

Ranking, analytic and frame windows map to ``pyspark.sql.Window``;
tumbling/sliding/session event-time windows map to ``F.window`` /
``F.session_window`` — usable identically over batch and Structured
Streaming DataFrames (SURVEY.md §2.6: the reference exposes these only
implicitly through ``transform()``).

Scale notes: window functions shuffle once on partition keys; top-k
per group never global-sorts (rank-filter plan). Event windows are
map-side bucket assignments — no extra shuffle beyond the groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_by: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group via row_number rank-filter — the scalable
    alternative to global sort+limit. ``order_by`` must be a total
    order (include a unique tiebreaker) for deterministic output."""
    w = Window.partitionBy(*group_by).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def event_time_window(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str | None = None,
    group_by: list[str] | None = None,
) -> DataFrame:
    """Tumbling (or sliding when ``slide`` differs) event-time window
    grouping: returns groupBy(window, *group_by) ready for ``.agg``."""
    win = F.window(F.col(ts_col), duration, slide) if slide else F.window(F.col(ts_col), duration)
    return df.groupBy(win.alias("win"), *(group_by or []))


def event_session_window(
    df: DataFrame,
    ts_col: str,
    gap: str,
    group_by: list[str] | None = None,
) -> DataFrame:
    """Session window (gap-based) grouping — ``F.session_window`` works
    on batch and streaming alike."""
    return df.groupBy(F.session_window(F.col(ts_col), gap).alias("win"), *(group_by or []))
