"""Stream-stream and stream-static joins — the Structured Streaming
join surface the reference never wired up (SURVEY.md §2.6 lists it as
implicit-only via ``transform()``).

Scale notes: a watermarked, time-bounded stream-stream join is the only
shape that keeps state finite — Spark buffers each side's rows in state
until the watermark passes the time-range bound, then evicts. An
unbounded (no time-condition) stream-stream inner join accumulates
state forever; this module refuses to build one unless the caller
explicitly opts in."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    watermark: str = "10 minutes",
    within: str | None = "15 minutes",
    how: str = "inner",
    allow_unbounded_state: bool = False,
) -> DataFrame:
    """Join two streaming DataFrames on equality keys plus the
    event-time bound ``right_ts ∈ [left_ts, left_ts + within]`` —
    the canonical bounded-state shape (Spark SQL guide, stream-stream
    joins). Both sides get ``withWatermark(ts, watermark)``; state for
    a row is dropped once the other side's watermark passes its bound.

    ``how``: inner / leftOuter / rightOuter / fullOuter (outer joins
    REQUIRE the time bound — Spark must know when a match can no
    longer arrive to emit the null row). ``within=None`` builds an
    unbounded inner join only with ``allow_unbounded_state=True``."""
    keys = [on] if isinstance(on, str) else list(on)
    if within is None:
        if how != "inner":
            raise ValueError("outer stream-stream joins require a time bound (within=...)")
        if not allow_unbounded_state:
            raise ValueError(
                "unbounded stream-stream join state grows forever; pass "
                "allow_unbounded_state=True to build it anyway"
            )
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    # disambiguate key columns via aliases; time bound references both
    la, ra = lw.alias("__l"), rw.alias("__r")
    cond: Column | None = None
    for k in keys:
        eq = F.col(f"__l.{k}") == F.col(f"__r.{k}")
        cond = eq if cond is None else (cond & eq)
    if within is not None:
        bound = (F.col(f"__r.{right_ts}") >= F.col(f"__l.{left_ts}")) & (
            F.col(f"__r.{right_ts}")
            <= F.col(f"__l.{left_ts}") + F.expr(f"INTERVAL {within}")
        )
        cond = bound if cond is None else (cond & bound)
    joined = la.join(ra, cond, how)
    # drop the right side's copy of the equality keys (post-join both exist)
    return joined.drop(*[F.col(f"__r.{k}") for k in keys])


def stream_static_join(
    stream: DataFrame,
    static: DataFrame,
    on: str | list[str],
    how: str = "inner",
    broadcast_static: bool = True,
) -> DataFrame:
    """Enrich a stream against a static dimension table. The static
    side is broadcast by default — per micro-batch this is a map-side
    hash join with no shuffle of the stream, the right plan for a
    dimension under a few GB; disable for large dims and let AQE pick
    a shuffle join per micro-batch."""
    s = F.broadcast(static) if broadcast_static else static
    return stream.join(s, on, how)
