"""Streaming sink adapters — each configures a ``DataStreamWriter``
(output mode / checkpoint / trigger applied by the pipeline). Coverage
parity with the reference's seven sinks + memory
(runtime/streaming/sinks.py:17-206): Kafka / Delta / Console / Iceberg /
File / CloudStorage (s3a|gs|abfss + compression) / ForeachBatch."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Protocol

from pyspark.sql import DataFrame
from pyspark.sql.streaming import DataStreamWriter

_CLOUD_FORMATS = ("parquet", "json", "csv", "avro", "orc")


class StreamingSink(Protocol):
    def write_stream(self, df: DataFrame) -> DataStreamWriter: ...


@dataclass
class KafkaStreamingSink:
    bootstrap_servers: str
    topic: str
    options: dict[str, str] = field(default_factory=dict)

    def write_stream(self, df: DataFrame) -> DataStreamWriter:
        writer = (
            df.writeStream.format("kafka")
            .option("kafka.bootstrap.servers", self.bootstrap_servers)
            .option("topic", self.topic)
        )
        for k, v in self.options.items():
            writer = writer.option(k, v)
        return writer


@dataclass
class DeltaStreamingSink:
    path: str
    partition_by: list[str] = field(default_factory=list)

    def write_stream(self, df: DataFrame) -> DataStreamWriter:
        writer = df.writeStream.format("delta").option("path", self.path)
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        return writer


@dataclass
class ConsoleStreamingSink:
    truncate: bool = True

    def write_stream(self, df: DataFrame) -> DataStreamWriter:
        return df.writeStream.format("console").option("truncate", str(self.truncate).lower())


@dataclass
class IcebergStreamingSink:
    table: str
    partition_by: list[str] = field(default_factory=list)

    def write_stream(self, df: DataFrame) -> DataStreamWriter:
        writer = df.writeStream.format("iceberg").option("path", self.table)
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        return writer


@dataclass
class FileStreamingSink:
    path: str
    file_format: str = "parquet"
    partition_by: list[str] = field(default_factory=list)

    def write_stream(self, df: DataFrame) -> DataStreamWriter:
        writer = df.writeStream.format(self.file_format).option("path", self.path)
        if self.file_format == "csv":
            # RFC 4180 quoting, matching the batch sink/source defaults
            # (io/writers.py) — a streaming CSV export must read back
            # through the same read_source defaults without corruption
            writer = writer.option("escape", '"')
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        return writer


@dataclass
class CloudStorageStreamingSink:
    """Object-store sink (s3a:// gs:// abfss://) with format allowlist +
    compression (reference sinks.py:136-179)."""

    path: str
    file_format: str = "parquet"
    compression: str | None = None
    partition_by: list[str] = field(default_factory=list)

    def __post_init__(self) -> None:
        if self.file_format not in _CLOUD_FORMATS:
            raise ValueError(f"file_format must be one of {_CLOUD_FORMATS}")

    def write_stream(self, df: DataFrame) -> DataStreamWriter:
        writer = df.writeStream.format(self.file_format).option("path", self.path)
        if self.file_format == "csv":
            writer = writer.option("escape", '"')  # match batch defaults
        if self.compression:
            writer = writer.option("compression", self.compression)
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        return writer


@dataclass
class ForeachBatchSink:
    """Per-micro-batch callback — upserts / MERGE / multi-sink fan-out."""

    process_batch: Callable[[DataFrame, int], None]

    def write_stream(self, df: DataFrame) -> DataStreamWriter:
        return df.writeStream.foreachBatch(self.process_batch)


@dataclass
class MemoryStreamingSink:
    """In-memory table sink — tests/debug only (unbounded on the driver)."""

    table_name: str

    def write_stream(self, df: DataFrame) -> DataStreamWriter:
        return df.writeStream.format("memory").queryName(self.table_name)
