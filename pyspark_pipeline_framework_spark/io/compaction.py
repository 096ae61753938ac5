"""Small-files compaction for ``batch_id``-partitioned incremental stores.

The incremental operators keep their state as parquet stores that grow
one ``batch_id=N`` partition per micro-batch (the MinHash band store —
``streaming.stateful.incremental_neardup_batch`` — and the IVF vector
store — ``streaming.stateful.streaming_ivf_add_batch``). That layout is
what makes replays idempotent, but after months of micro-batches it is
the classic Spark small-files pathology: tens of thousands of tiny
partition directories, each with its own footer, open, and task — list
and scan costs grow with batch COUNT, not data size.

:func:`compact_batch_store` folds the whole history into a single
**baseline partition** ``batch_id=-1``. The choice of ``-1`` is what
keeps every incremental contract valid after the swap:

* the history filter ``batch_id < N`` (see
  ``incremental_neardup_batch``) still includes the baseline for every
  real micro-batch id ``N >= 0``;
* a replayed micro-batch still overwrites only its own ``batch_id=N``
  partition — it can never touch the baseline;
* **restarting the stream with a FRESH checkpoint becomes safe**:
  Spark restarts batch ids at 0, and against an uncompacted store the
  new stream's first batch would silently overwrite the old
  ``batch_id=0`` partition (history loss). Against a compacted store
  the history lives at ``-1``, which no stream ever writes.

Compaction writes a NEW store directory and refuses to overwrite
anything — an interrupted compaction must never be able to damage the
only copy. Swap paths in the pipeline config (or rename directories)
once the write succeeds, then delete the old store.

Run compaction with the writing stream STOPPED (it is maintenance, not
a concurrent operator): the input file listing is fixed at scan
planning, so a micro-batch landing mid-compaction would exist only in
the old store — deleting the old store after the swap would silently
drop it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def compact_batch_store(
    spark: SparkSession,
    store_path: str,
    out_path: str,
    *,
    baseline_batch_id: int = -1,
    target_files: int | None = None,
    partition_by: list[str] | None = None,
    sort_within_partitions: list[str] | None = None,
) -> DataFrame:
    """Rewrite a ``batch_id=N``-per-micro-batch store as one baseline
    partition ``batch_id=<baseline_batch_id>`` at ``out_path``.

    ``target_files`` bounds the output file count (one exchange; default
    ``spark.sparkContext.defaultParallelism``). ``partition_by`` instead
    sub-partitions the baseline by the given columns (e.g. ``["cell"]``
    for an IVF store, so searches static-prune compacted history too);
    rows are repartitioned on those keys so each value lands in few
    files. ``sort_within_partitions`` sorts rows inside each output
    file (no extra exchange — a per-partition sort before the write):
    sorting a band store by ``band_hash`` (or an IVF baseline by
    ``cell``) turns the key columns into dictionary/RLE runs and gives
    parquet row-group min/max statistics that scans can skip on.
    Returns the compacted store read back from ``out_path``.
    """
    if not isinstance(baseline_batch_id, int) or baseline_batch_id >= 0:
        raise ValueError(
            "baseline_batch_id must be a negative int — real micro-batch "
            f"ids start at 0 and must stay overwritable, got {baseline_batch_id!r}"
        )
    def _canon(p: str) -> str:
        # resolve local paths so "store/" and "./store" collide loudly;
        # URI paths (s3://, hdfs://) are compared as written — abspath
        # would mangle the scheme
        p = p.rstrip("/")
        return p if "://" in p else os.path.abspath(p)

    if _canon(out_path) == _canon(store_path):
        raise ValueError(
            "compaction must write a NEW store directory (out_path == "
            "store_path): an interrupted in-place rewrite would corrupt "
            "the only copy"
        )
    df = spark.read.parquet(store_path)
    if "batch_id" not in df.columns:
        raise ValueError(
            f"{store_path} is not a batch_id-partitioned store "
            f"(columns: {df.columns})"
        )
    body = df.drop("batch_id").withColumn(
        "batch_id", F.lit(baseline_batch_id).cast("int")
    )
    if partition_by:
        missing = [c for c in partition_by if c not in body.columns]
        if missing:
            raise ValueError(f"partition_by columns not in store: {missing}")
        body = body.repartition(*[F.col(c) for c in partition_by])
        spec = ["batch_id", *partition_by]
    else:
        body = body.repartition(
            target_files or spark.sparkContext.defaultParallelism
        )
        spec = ["batch_id"]
    if sort_within_partitions:
        missing = [c for c in sort_within_partitions if c not in body.columns]
        if missing:
            raise ValueError(
                f"sort_within_partitions columns not in store: {missing}"
            )
        body = body.sortWithinPartitions(*sort_within_partitions)
    # errorifexists: compaction targets a fresh directory, never an
    # existing one — the swap is the caller's explicit, checkable step
    body.write.mode("errorifexists").partitionBy(*spec).parquet(out_path)
    return spark.read.parquet(out_path)
