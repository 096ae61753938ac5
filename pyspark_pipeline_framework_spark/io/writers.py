"""Batch sinks.

Capability parity: reference ``WriteCsv`` / ``WriteTable``
(examples/batch.py:105-168,296-364) — mode, header, partitionBy,
saveAsTable — generalized to every Spark batch format.

Scale notes: ``partition_by`` drives on-disk layout → partition pruning
for downstream readers; ``bucket_by`` enables shuffle-free co-located
joins on the bucket key (SURVEY.md 'Partitioning & shuffle').
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class SinkConfig:
    format: str = "parquet"           # parquet | csv | json | orc | table
    path: str | None = None
    table: str | None = None
    mode: str = "overwrite"           # append | overwrite | ignore | error
    partition_by: list[str] = field(default_factory=list)
    bucket_by: tuple[int, list[str]] | None = None  # (num_buckets, cols); table sinks only
    sort_by: list[str] = field(default_factory=list)
    options: dict[str, str] = field(default_factory=dict)


def write_sink(df: DataFrame, config: SinkConfig) -> None:
    writer = df.write.mode(config.mode)
    for k, v in config.options.items():
        writer = writer.option(k, v)
    if config.partition_by:
        writer = writer.partitionBy(*config.partition_by)
    if config.format == "table" or config.table:
        if config.bucket_by:
            n, cols = config.bucket_by
            writer = writer.bucketBy(n, *cols)
            if config.sort_by:
                writer = writer.sortBy(*config.sort_by)
        if not config.table:
            raise ValueError("table sink requires table name")
        writer.saveAsTable(config.table)
        return
    if not config.path:
        raise ValueError(f"format={config.format!r} sink requires path")
    if config.format == "csv":
        writer = writer.option("header", config.options.get("header", "true"))
        # RFC 4180 quoting (doubled "" inside quoted fields) instead of
        # Spark's backslash-escape default: the output parses in
        # standard CSV tooling AND round-trips through read_source's
        # matching default (r6 — the mismatched defaults silently
        # corrupted quote/comma-bearing fields on re-read).
        writer = writer.option("escape", config.options.get("escape", '"'))
    writer.format(config.format).save(config.path)
    if config.partition_by and config.format == "parquet":
        _ensure_readable_when_empty(df, config)


def _ensure_readable_when_empty(df: DataFrame, config: SinkConfig) -> None:
    """Spark's dynamic-partition writer emits one file per partition
    VALUE — an empty input therefore writes only ``_SUCCESS`` and the
    dataset cannot be re-read (UNABLE_TO_INFER_SCHEMA). Empty writes
    are legitimate at scale (incremental runs with no new data), so
    when the partitioned write produced no data files, append a single
    schema-bearing empty file at the root: ``spark.read`` then yields
    the full schema (including the partition columns, which the empty
    file retains as regular columns) and zero rows. Costs one
    directory listing on the hot path; only the empty case writes.
    Found by the r6 empty-input sweep (tools/emptycheck list)."""
    import os

    path = config.path
    assert path is not None
    try:
        entries = os.listdir(path)
    except OSError:
        return  # non-local filesystem: listing not available, skip
    if any(not e.startswith(("_", ".")) for e in entries):
        return  # data files (or partition dirs) exist
    df.limit(0).coalesce(1).write.mode("append").format("parquet").save(path)
