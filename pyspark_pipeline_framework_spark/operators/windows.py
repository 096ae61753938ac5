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

    ARBITRARY frames (r9 VERDICT item 5): ``lower <= upper`` is the
    only shape constraint — leading-only (``0 < lower``) and
    trailing-only (``upper < 0``) frames that EXCLUDE the current row
    are supported. Their frame may live entirely in ONE bin that is
    not the row's own; for that case a third probe kind computes the
    frame with a bin-local range window at the frame's start (prefix +
    suffix would double-count the bin total). The crossing case stays
    the two-endpoint prefix/suffix decomposition, and the row's own
    bin is always covered by the intra range window (empty when the
    frame misses it).

    Constraints: ``bin_width >= upper - lower`` (defaults to the span,
    min 1), and ``key_cols`` must uniquely identify rows (used to join
    the boundary contribution back). If every value lands in one bin
    the plan degrades to the global sort it replaces — pick
    ``bin_width`` near the frame span, not near the value range.

    Float note: the ``sum`` neighbor contribution is computed as
    (bin total − prefix), so a float ``value_col`` can differ from the
    naive window in the last ulp; for bit-exact float sums cast the
    value column to ``decimal(38,6)`` first (the suite's
    ``q_win_range_frame_sum`` pattern). ``count``/``min``/``max`` are
    exact for any type. ``agg="avg"`` is native and FUSED: the sum and
    count channels share one binning, one probe union and one window
    pass per bin, and the result is the deterministic cross-engine
    recipe ``CAST(exact_sum AS DOUBLE) / count`` (one IEEE division —
    pass a decimal ``value_col`` for an exact sum; empty frame →
    NULL, matching SQL ``AVG``).
    """
    if lower > upper:
        raise ValueError(f"frame bounds must satisfy lower <= upper: lower={lower}, upper={upper}")
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
    B = float(bin_width) if bin_width is not None else max(span, 1.0)
    if B < span or B <= 0:
        raise ValueError(f"bin_width {B} must be positive and >= frame span {span}")
    if not key_cols:
        raise ValueError("key_cols (a unique row key) is required")
    is_avg = agg == "avg"
    if agg == "count":
        weight = F.lit(1).cast("long")
        wtype = "long"
        intra_agg = F.count(F.lit(1))
    elif agg in ("sum", "min", "max", "avg"):
        if value_col is None:
            raise ValueError(f"agg={agg!r} requires value_col")
        weight = F.col(value_col)
        wtype = dict(df.dtypes)[value_col]
        intra_agg = {"sum": F.sum, "min": F.min, "max": F.max,
                     "avg": F.sum}[agg](value_col)
    else:
        raise ValueError(
            f"agg must be 'count', 'sum', 'min', 'max' or 'avg', got {agg!r}"
        )

    v = F.col(order_col)
    binned = df.withColumn("_grf_bin", F.floor(v / B))

    # pass 1: the exact same range frame, partitioned by bin — covers
    # every frame member that shares the row's bin (empty — NULL sum /
    # 0 count — when a leading/trailing frame misses the row's bin)
    w_intra = (
        Window.partitionBy("_grf_bin").orderBy(order_col).rangeBetween(lower, upper)
    )
    # sum carries the same presence-count channel as avg: SUM over a
    # frame with NO non-null values is NULL, and with leading/trailing
    # frames (or NULL values) the zero-coalesced probe arithmetic alone
    # cannot distinguish "empty" from "sums to 0"
    dual = agg in ("sum", "avg")
    intra = binned.withColumn("_grf_intra", intra_agg.over(w_intra))
    if dual:
        # fused count channel: same window spec → Catalyst computes
        # both aggregates in ONE Window operator, no extra pass
        intra = intra.withColumn("_grf_intra_c", F.count(value_col).over(w_intra))

    # pass 2: boundary probes into foreign bins. Three kinds:
    #   kind 0 — frame CROSSES out of bin p at its start: suffix
    #            (rows >= v+lower) in p;
    #   kind 2 — frame crosses into bin q at its end: prefix
    #            (rows <= v+upper) in q;
    #   kind 3 — the WHOLE frame lives in one foreign bin (leading/
    #            trailing frames): prefix+suffix would double-count the
    #            bin total, so a bin-local range window [0, span] at
    #            the frame start computes it directly.
    # kind orders a probe against equal-valued data rows so inclusive
    # endpoints count: kind 0 sorts BEFORE data (kind 1) at t ==
    # v+lower in the suffix order, kind 2 AFTER data at t == v+upper.
    t_lo = v + F.lit(float(lower))
    t_hi = v + F.lit(float(upper))
    p_bin = F.floor(t_lo / B)
    q_bin = F.floor(t_hi / B)
    r_bin = F.col("_grf_bin")
    probe_arr = F.array(
        F.struct(t_lo.alias("t"), F.lit(0).alias("kind"),
                 ((p_bin != q_bin) & (p_bin != r_bin)).alias("keep")),
        F.struct(t_hi.alias("t"), F.lit(2).alias("kind"),
                 ((p_bin != q_bin) & (q_bin != r_bin)).alias("keep")),
        F.struct(t_lo.alias("t"), F.lit(3).alias("kind"),
                 ((p_bin == q_bin) & (p_bin != r_bin)).alias("keep")),
    )
    null_w = [F.lit(None).cast(wtype).alias("w")]
    if dual:
        null_w.append(F.lit(None).cast("long").alias("wc"))
    probes = (
        binned.select(
            *key_cols,
            F.explode(F.filter(probe_arr, lambda s: s["keep"])).alias("p"),
        )
        .select(*key_cols, F.col("p.t").alias("t"), F.col("p.kind").alias("kind"))
        .withColumn("bin", F.floor(F.col("t") / B))
        .select(*key_cols, "bin", "t", "kind", *null_w)
    )
    key_types = dict(df.dtypes)
    data_w = [weight.alias("w")]
    if dual:
        # SQL SUM/AVG skip NULL values: the count channel weights only
        # rows whose value is present
        data_w.append(
            F.when(weight.isNotNull(), F.lit(1).cast("long")).alias("wc")
        )
    data = binned.select(
        *[F.lit(None).cast(key_types[k]).alias(k) for k in key_cols],
        F.col("_grf_bin").alias("bin"),
        v.alias("t"),
        F.lit(1).alias("kind"),
        *data_w,
    )
    merged = data.unionByName(probes)
    # prefix window (t asc, probes of kind 2 AFTER equal-valued data):
    # aggregates data rows with u <= t. suffix window (t desc, probes
    # of kind 0 AFTER equal-valued data in the reversed order):
    # aggregates data rows with u >= t. range window (kind 3): data
    # rows with u in [t, t+span], value-based so probe order is moot.
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
    w_range = (
        Window.partitionBy("bin").orderBy("t").rangeBetween(0, upper - lower)
    )
    # kind-3 probes exist ONLY for frames excluding the current row
    # (lower <= 0 <= upper forces the frame to touch the row's own
    # bin); gating the branch keeps the extra range-window pass out of
    # the running-total plans entirely
    needs_range = not (lower <= 0 <= upper)
    zero = F.lit(0).cast(wtype)

    def _cum_contrib(col: str, z: Column) -> Column:
        w_tot = Window.partitionBy("bin")
        cum = F.coalesce(F.sum(col).over(w_cum), z)
        tot = F.coalesce(F.sum(col).over(w_tot), z)
        c = F.when(F.col("kind") == 0, tot - cum).when(F.col("kind") == 2, cum)
        if needs_range:
            c = c.when(
                F.col("kind") == 3, F.coalesce(F.sum(col).over(w_range), z)
            )
        return c

    contribs: list[Column] = []
    neighbor_aggs: list[Column] = []
    if agg in ("count", "sum", "avg"):
        contribs.append(_cum_contrib("w", zero).alias("_grf_c"))
        neighbor_aggs.append(F.sum("_grf_c").alias("_grf_neighbor"))
        if agg == "count":
            combine = F.col("_grf_intra") + F.coalesce(F.col("_grf_neighbor"), zero)
        else:
            contribs.append(_cum_contrib("wc", F.lit(0).cast("long")).alias("_grf_cc"))
            neighbor_aggs.append(F.sum("_grf_cc").alias("_grf_neighbor_c"))
            cnt_total = F.col("_grf_intra_c") + F.coalesce(
                F.col("_grf_neighbor_c"), F.lit(0).cast("long")
            )
            sum_total = F.coalesce(F.col("_grf_intra"), zero) + F.coalesce(
                F.col("_grf_neighbor"), zero
            )
            if is_avg:
                # deterministic cross-engine avg: exact sum (caller
                # passes a decimal value_col) cast to double, ONE IEEE
                # division — the suite's davg / o_davg recipe
                combine = F.when(
                    cnt_total > 0, sum_total.cast("double") / cnt_total
                )
            else:
                # SUM over a frame with no non-null values is NULL —
                # the presence count, not the zero-coalesced sum, is
                # what can tell (leading/trailing frames, NULL values)
                combine = F.when(cnt_total > 0, sum_total)
    else:  # min / max: extremum of the suffix (kind 0) / prefix (kind 2)
        ext = F.min if agg == "min" else F.max
        c = F.when(F.col("kind") == 0, ext("w").over(w_suffix)).when(
            F.col("kind") == 2, ext("w").over(w_cum)
        )
        if needs_range:
            c = c.when(F.col("kind") == 3, ext("w").over(w_range))
        contribs.append(c.alias("_grf_c"))
        neighbor_aggs.append(ext("_grf_c").alias("_grf_neighbor"))
        # least/greatest skip NULLs: a row with no adjacent-bin frame
        # members keeps its intra extremum (and vice versa)
        combine = (F.least if agg == "min" else F.greatest)(
            F.col("_grf_intra"), F.col("_grf_neighbor")
        )
    neighbor = (
        merged.select("*", *contribs)
        .where(F.col("kind") != 1)
        .groupBy(*key_cols)
        .agg(*[a for a in neighbor_aggs])
    )

    out = intra.join(neighbor, on=list(key_cols), how="left")
    drop_cols = ["_grf_bin", "_grf_intra", "_grf_neighbor"]
    if dual:
        drop_cols += ["_grf_intra_c", "_grf_neighbor_c"]
    return out.withColumn(result_col, combine).drop(*drop_cols)
