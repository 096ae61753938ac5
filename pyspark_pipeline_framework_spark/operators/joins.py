"""Join operators.

Equi/semi/anti/theta joins map straight onto ``DataFrame.join`` (the
reference reaches them via SQL passthrough only — SURVEY.md §2.5).
Two operators Spark lacks natively are built as shuffle-bounded
compositions:

* :func:`asof_join` — nearest-earlier join (union-merge + running
  ``last(..., ignorenulls)``), one shuffle on the key, no N² pairs.
* :func:`range_join` — interval join via time bucketization, turning
  an unbounded BNLJ into an equi-join on bucket + residual predicate.
  This is the 100 TB-safe plan: pair count is bounded by
  rows × (window/bucket + 1), never rows².
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | Column,
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """Declarative join; ``broadcast_right`` pins the small-dim plan."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on, how)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Skew-safe equi-join: the left (skewed) side gets a random-ish but
    DETERMINISTIC salt (hash of all left columns mod ``salt``), the
    right side is replicated ``salt`` times, and the join key becomes
    (key, salt). A single hot key now spreads over ``salt`` reducers.

    Semantics identical to ``left.join(right, on, how)`` for inner /
    left joins (each left row matches exactly its replica). AQE's
    skew-join handles moderate skew automatically; salting is for the
    pathological single-key case AQE can't split further."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    l = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt)).cast("int")
    )
    r = right.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    out = l.join(r, on + ["__salt"], how)
    return out.drop("__salt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_values: list[str],
    how: str = "inner",
) -> DataFrame:
    """As-of (nearest-earlier) join: for each left row, the latest right
    row with the same ``key`` and ``right_ts <= left_ts``.

    Spark has no native ASOF JOIN (DuckDB does — used as the oracle);
    the distributed formulation is union-merge: tag both sides, union,
    sort within key by time, carry right values forward with
    ``last(..., ignorenulls=True)``, keep left rows. Cost: ONE shuffle
    on ``key`` — same as any grouped op; no range explosion.

    ``right`` must be unique per (key, right_ts) — pre-aggregate if
    not, or the carried value is nondeterministic. ``right_values``
    names must not collide with ``left`` columns (rename first).
    """
    overlap = set(right_values) & set(left.columns)
    if overlap:
        raise ValueError(f"right_values collide with left columns: {sorted(overlap)}")
    lcols = left.columns
    rtypes = dict(right.dtypes)
    l = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*lcols).alias("__lrow"),
        *[F.lit(None).cast(rtypes[c]).alias(c) for c in right_values],
    )
    lrow_type = l.schema["__lrow"].dataType
    r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(lrow_type).alias("__lrow"),
        *[F.col(c) for c in right_values],
    )
    # right rows sort before left rows at equal timestamps so a right
    # row with right_ts == left_ts is visible to that left row
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = l.unionByName(r)
    carried = [F.last(c, ignorenulls=True).over(w).alias(c) for c in right_values]
    merged = merged.select("__is_left", "__lrow", *carried)
    out = merged.filter(F.col("__is_left") == 1).select("__lrow.*", *right_values)
    if how == "inner" and right_values:
        cond = F.col(right_values[0]).isNotNull()
        for c in right_values[1:]:
            cond = cond | F.col(c).isNotNull()
        out = out.filter(cond)
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower: str,
    upper: str,
    bucket_seconds: int,
    extra_on: list[str] | None = None,
) -> DataFrame:
    """Interval join: right rows with
    ``left_ts + lower < right_ts <= left_ts + upper`` (SQL INTERVAL
    strings), made scalable by bucketizing time to ``bucket_seconds``
    and equi-joining on bucket id before the exact residual predicate.

    Plan shape: explode left to the covered bucket ids (bounded by
    window/bucket + 1), one shuffle on bucket id, residual filter.
    Catalyst sees a plain equi-join — sort-merge / AQE all apply.
    """
    lo = F.expr(f"INTERVAL {lower}")
    hi = F.expr(f"INTERVAL {upper}")
    l = left.withColumn("__lo", F.col(left_ts) + lo).withColumn("__hi", F.col(left_ts) + hi)
    l = l.withColumn(
        "__bid",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp("__lo") / bucket_seconds),
                F.floor(F.unix_timestamp("__hi") / bucket_seconds),
            )
        ),
    )
    r = right.withColumn("__bid", F.floor(F.unix_timestamp(F.col(right_ts)) / bucket_seconds))
    cond = l["__bid"] == r["__bid"]
    for c in extra_on or []:
        cond = cond & (l[c] == r[c])
    joined = (
        l.join(r, cond, "inner")
        .filter((r[right_ts] > l["__lo"]) & (r[right_ts] <= l["__hi"]))
        .drop("__lo", "__hi", "__bid")
    )
    return joined
