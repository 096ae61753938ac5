"""Streaming source adapters — each builds a ``spark.readStream``
DataFrame. Coverage parity with the reference's seven sources
(runtime/streaming/sources.py:15-245): Kafka / File / Delta / Iceberg /
Rate / EventHubs / Kinesis. Connector-backed sources (kafka, delta,
iceberg, eventhubs, kinesis) need their packages on the Spark
classpath; construction is cheap and validated, the ``load`` fails
fast with Spark's own missing-source error if absent."""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Protocol

from pyspark.sql import DataFrame, SparkSession


class StreamingSource(Protocol):
    def read_stream(self, spark: SparkSession) -> DataFrame: ...


@dataclass
class KafkaStreamingSource:
    bootstrap_servers: str
    topics: str                       # comma-separated subscribe list
    starting_offsets: str = "latest"
    options: dict[str, str] = field(default_factory=dict)

    def read_stream(self, spark: SparkSession) -> DataFrame:
        reader = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", self.bootstrap_servers)
            .option("subscribe", self.topics)
            .option("startingOffsets", self.starting_offsets)
        )
        for k, v in self.options.items():
            reader = reader.option(k, v)
        return reader.load()


@dataclass
class FileStreamingSource:
    path: str
    file_format: str = "parquet"      # parquet | json | csv | orc | text
    schema: str | None = None          # DDL string; required by most formats
    options: dict[str, str] = field(default_factory=dict)

    def read_stream(self, spark: SparkSession) -> DataFrame:
        reader = spark.readStream.format(self.file_format)
        if self.schema:
            reader = reader.schema(self.schema)
        if self.file_format == "csv":
            # RFC 4180 quoting, matching the batch/streaming sink
            # defaults (io/writers.py, streaming/sinks.py); overridable
            reader = reader.option("escape", self.options.get("escape", '"'))
        for k, v in self.options.items():
            reader = reader.option(k, v)
        return reader.load(self.path)


@dataclass
class DeltaStreamingSource:
    path: str
    options: dict[str, str] = field(default_factory=dict)

    def read_stream(self, spark: SparkSession) -> DataFrame:
        reader = spark.readStream.format("delta")
        for k, v in self.options.items():
            reader = reader.option(k, v)
        return reader.load(self.path)


@dataclass
class IcebergStreamingSource:
    table: str
    options: dict[str, str] = field(default_factory=dict)

    def read_stream(self, spark: SparkSession) -> DataFrame:
        reader = spark.readStream.format("iceberg")
        for k, v in self.options.items():
            reader = reader.option(k, v)
        return reader.load(self.table)


@dataclass
class RateStreamingSource:
    """Built-in rate source — the bench/test source
    (schema: timestamp, value)."""

    rows_per_second: int = 10
    num_partitions: int = 1

    def read_stream(self, spark: SparkSession) -> DataFrame:
        return (
            spark.readStream.format("rate")
            .option("rowsPerSecond", str(self.rows_per_second))
            .option("numPartitions", str(self.num_partitions))
            .load()
        )


@dataclass
class EventHubsStreamingSource:
    connection_string: str
    consumer_group: str = "$Default"
    starting_position: dict | None = None
    max_events_per_trigger: int | None = None
    options: dict[str, str] = field(default_factory=dict)

    def read_stream(self, spark: SparkSession) -> DataFrame:
        reader = spark.readStream.format("eventhubs").option(
            "eventhubs.connectionString", self.connection_string
        ).option("eventhubs.consumerGroup", self.consumer_group)
        if self.starting_position is not None:
            reader = reader.option(
                "eventhubs.startingPosition", json.dumps(self.starting_position)
            )
        if self.max_events_per_trigger is not None:
            reader = reader.option("maxEventsPerTrigger", str(self.max_events_per_trigger))
        for k, v in self.options.items():
            reader = reader.option(k, v)
        return reader.load()


@dataclass
class KinesisStreamingSource:
    stream_name: str
    region: str = "us-east-1"
    starting_position: str = "LATEST"
    endpoint: str | None = None
    options: dict[str, str] = field(default_factory=dict)

    def read_stream(self, spark: SparkSession) -> DataFrame:
        reader = (
            spark.readStream.format("kinesis")
            .option("streamName", self.stream_name)
            .option("region", self.region)
            .option("startingPosition", self.starting_position)
        )
        if self.endpoint:
            reader = reader.option("endpointUrl", self.endpoint)
        for k, v in self.options.items():
            reader = reader.option(k, v)
        return reader.load()
