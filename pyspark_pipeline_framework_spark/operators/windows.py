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


def global_range_frame(
    df: DataFrame,
    order_col: str,
    lower: float,
    upper: float,
    agg: str = "count",
    value_col: str | None = None,
    key_cols: list[str] | None = None,
    bin_width: float | None = None,
    result_col: str = "range_agg",
) -> DataFrame:
    """Global (unpartitioned) value-range window frame that scales.

    Computes, for every row with order value ``v``, ``count(*)``,
    ``sum(value_col)``, ``min(value_col)`` or ``max(value_col)`` over
    ALL rows whose ``order_col`` lies in
    ``[v + lower, v + upper]`` — the semantics of
    ``Window.orderBy(order_col).rangeBetween(lower, upper)`` WITHOUT
    the ``Exchange SinglePartition`` that plan forces (Spark warns
    "No Partition Defined ... Moving all data to a single partition";
    at 100× the data that is one task sorting the whole table).

    Distributed formulation (two bounded passes):

    1. Bin the order key: ``bin = floor(v / B)`` with ``B >= upper -
       lower``, so each row's frame intersects at most its own bin and
       ONE adjacent bin per side. Intra-bin frames come from the same
       range window PARTITIONED by bin — one keyed shuffle.
    2. Adjacent-bin boundary contributions via probe rows (the as-of
       join's union-merge idea, ``operators/joins.py:60``): each row
       whose frame endpoint ``v+lower`` / ``v+upper`` falls in a
       neighboring bin emits a zero-weight probe at that endpoint; one
       cumulative-sum window per bin over the union of data + probes
       yields "rows at-or-after v+lower" / "rows at-or-before v+upper"
       in that neighbor bin, re-aggregated per row key and added to the
       intra count with one aggregate-join.

    Every exchange is keyed by bin or by ``key_cols`` — nothing is
    single-partition; AQE handles bin skew like any other keyed stage.

    Constraints: ``lower <= 0 <= upper`` (frame must include the
    current row — covers running totals and symmetric neighborhoods;
    trailing/leading-only frames would need a third probe case),
    ``bin_width >= upper - lower`` (defaults to exactly the span), and
    ``key_cols`` must uniquely identify rows (used to join the
    boundary contribution back). If every value lands in one bin the
    plan degrades to the global sort it replaces — pick ``bin_width``
    near the frame span, not near the value range.

    Float note: the ``sum`` neighbor contribution is computed as
    (bin total − prefix), so a float ``value_col`` can differ from the
    naive window in the last ulp; for bit-exact float sums cast the
    value column to ``decimal(38,6)`` first (the suite's
    ``q_win_range_frame_sum`` pattern). ``count``/``min``/``max`` are
    exact for any type. For ``avg``, compose: run once with
    ``agg="sum"`` and once with ``agg="count"`` (two window passes over
    the same binning) and divide — matching the built-in ``avg``'s own
    sum/count definition.
    """
    if not lower <= 0 <= upper:
        raise ValueError(f"frame must include the current row: lower={lower}, upper={upper}")
    # PySpark's Window.rangeBetween only accepts integer offsets (the
    # Py4J overload is (long, long)); the ORDER column may still be
    # fractional — only the frame bounds must be whole numbers
    if not (float(lower).is_integer() and float(upper).is_integer()):
        raise ValueError(
            f"lower/upper must be whole numbers (PySpark rangeBetween "
            f"accepts only integer offsets): lower={lower}, upper={upper}"
        )
    lower, upper = int(lower), int(upper)
    span = float(upper) - float(lower)
    B = float(bin_width) if bin_width is not None else span
    if B < span or B <= 0:
        raise ValueError(f"bin_width {B} must be positive and >= frame span {span}")
    if not key_cols:
        raise ValueError("key_cols (a unique row key) is required")
    if agg == "count":
        weight = F.lit(1).cast("long")
        wtype = "long"
        intra_agg = F.count(F.lit(1))
    elif agg in ("sum", "min", "max"):
        if value_col is None:
            raise ValueError(f"agg={agg!r} requires value_col")
        weight = F.col(value_col)
        wtype = dict(df.dtypes)[value_col]
        intra_agg = {"sum": F.sum, "min": F.min, "max": F.max}[agg](value_col)
    else:
        raise ValueError(f"agg must be 'count', 'sum', 'min' or 'max', got {agg!r}")

    v = F.col(order_col)
    binned = df.withColumn("_grf_bin", F.floor(v / B))

    # pass 1: the exact same range frame, partitioned by bin — covers
    # every frame member that shares the row's bin
    w_intra = (
        Window.partitionBy("_grf_bin").orderBy(order_col).rangeBetween(lower, upper)
    )
    intra = binned.withColumn("_grf_intra", intra_agg.over(w_intra))

    # pass 2: boundary probes into adjacent bins. kind orders a probe
    # against equal-valued data rows so inclusive endpoints count:
    # lower-probe (kind 0) sorts BEFORE data (kind 1) at t == v+lower,
    # upper-probe (kind 2) sorts AFTER data at t == v+upper.
    t_lo = (v + F.lit(float(lower))).alias("t")
    t_hi = (v + F.lit(float(upper))).alias("t")
    probes = (
        binned.select(
            *key_cols,
            F.col("_grf_bin"),
            F.explode(
                F.array(
                    F.struct(t_lo, F.lit(0).alias("kind")),
                    F.struct(t_hi, F.lit(2).alias("kind")),
                )
            ).alias("p"),
        )
        .select(*key_cols, "_grf_bin", "p.t", "p.kind")
        .withColumn("bin", F.floor(F.col("t") / B))
        .where(F.col("bin") != F.col("_grf_bin"))
        .select(*key_cols, "bin", "t", "kind", F.lit(None).cast(wtype).alias("w"))
    )
    key_types = dict(df.dtypes)
    data = binned.select(
        *[F.lit(None).cast(key_types[k]).alias(k) for k in key_cols],
        F.col("_grf_bin").alias("bin"),
        v.alias("t"),
        F.lit(1).alias("kind"),
        weight.alias("w"),
    )
    merged = data.unionByName(probes)
    # prefix window (t asc, probes of kind 2 AFTER equal-valued data):
    # aggregates data rows with u <= t. suffix window (t desc, probes
    # of kind 0 AFTER equal-valued data in the reversed order):
    # aggregates data rows with u >= t.
    w_cum = (
        Window.partitionBy("bin")
        .orderBy(F.col("t").asc(), F.col("kind").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_suffix = (
        Window.partitionBy("bin")
        .orderBy(F.col("t").desc(), F.col("kind").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    zero = F.lit(0).cast(wtype)
    if agg in ("count", "sum"):
        w_tot = Window.partitionBy("bin")
        cum = F.coalesce(F.sum("w").over(w_cum), zero)
        tot = F.coalesce(F.sum("w").over(w_tot), zero)
        contrib = F.when(F.col("kind") == 0, tot - cum).when(F.col("kind") == 2, cum)
        neighbor_agg = F.sum("_grf_c")
        combine = F.col("_grf_intra") + F.coalesce(F.col("_grf_neighbor"), zero)
    else:  # min / max: extremum of the suffix (kind 0) / prefix (kind 2)
        ext = F.min if agg == "min" else F.max
        contrib = F.when(F.col("kind") == 0, ext("w").over(w_suffix)).when(
            F.col("kind") == 2, ext("w").over(w_cum)
        )
        neighbor_agg = ext("_grf_c")
        # least/greatest skip NULLs: a row with no adjacent-bin frame
        # members keeps its intra extremum (and vice versa)
        combine = (F.least if agg == "min" else F.greatest)(
            F.col("_grf_intra"), F.col("_grf_neighbor")
        )
    neighbor = (
        merged.withColumn("_grf_c", contrib)
        .where(F.col("kind") != 1)
        .groupBy(*key_cols)
        .agg(neighbor_agg.alias("_grf_neighbor"))
    )

    out = intra.join(neighbor, on=list(key_cols), how="left")
    return (
        out.withColumn(result_col, combine)
        .drop("_grf_bin", "_grf_intra", "_grf_neighbor")
    )
