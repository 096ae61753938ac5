"""Partitioning utilities for CPU-bound map stages.

Parquet splits are row-group based: a 100 TB table carries thousands of
row groups and parallelizes naturally, but a small single-row-group
file (exactly what a local bench or a sampled extract reads) collapses
to ONE input partition — and then every expression-heavy map stage
(shingling, hashing, vectorized UDFs) runs single-threaded no matter
how many cores the session has.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` up to the session's default
    parallelism — but ONLY when the scan actually under-splits (fewer
    input partitions than the target). On a production-scale input this
    is a metadata check and a no-op: no job runs, no shuffle is added.
    On an under-split input the one-time shuffle of the payload buys a
    cores-wide downstream pipeline, which dominates for CPU-bound ops.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    # getNumPartitions is plan metadata — it does not launch a job
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
