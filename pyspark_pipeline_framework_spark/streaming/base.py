"""Streaming pipeline wiring.

Capability parity with the reference's ``StreamingPipeline``
(runtime/streaming/base.py:53-175): source → optional watermark →
``transform()`` → sink → output mode → checkpoint → query name →
trigger → start; blocking ``run()`` vs handle-returning
``start_stream()``. Triggers: PROCESSING_TIME / ONCE / AVAILABLE_NOW /
CONTINUOUS (interval required where the reference requires it,
base.py:25-50).

Scale notes: watermarks bound state for windowed aggs and stream-stream
joins; checkpoint locations must be per-query; ``foreachBatch`` is the
upsert/fan-out escape hatch."""

from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import DataStreamWriter, StreamingQuery

from pyspark_pipeline_framework_spark.streaming.sinks import StreamingSink
from pyspark_pipeline_framework_spark.streaming.sources import StreamingSource


class OutputMode(enum.Enum):
    APPEND = "append"
    COMPLETE = "complete"
    UPDATE = "update"


class TriggerType(enum.Enum):
    PROCESSING_TIME = "processing_time"
    ONCE = "once"
    AVAILABLE_NOW = "available_now"
    CONTINUOUS = "continuous"


@dataclass(frozen=True)
class Trigger:
    trigger_type: TriggerType = TriggerType.PROCESSING_TIME
    interval: str | None = None

    def __post_init__(self) -> None:
        needs_interval = self.trigger_type in (
            TriggerType.PROCESSING_TIME,
            TriggerType.CONTINUOUS,
        )
        if needs_interval and not self.interval:
            raise ValueError(f"trigger {self.trigger_type.value} requires an interval")

    def apply(self, writer: DataStreamWriter) -> DataStreamWriter:
        t = self.trigger_type
        if t == TriggerType.PROCESSING_TIME:
            return writer.trigger(processingTime=self.interval)
        if t == TriggerType.ONCE:
            return writer.trigger(once=True)
        if t == TriggerType.AVAILABLE_NOW:
            return writer.trigger(availableNow=True)
        return writer.trigger(continuous=self.interval)


class StreamingPipeline:
    """Subclass and override ``transform``; or pass ``transform_fn``."""

    def __init__(
        self,
        source: StreamingSource,
        sink: StreamingSink,
        output_mode: OutputMode = OutputMode.APPEND,
        trigger: Trigger | None = None,
        checkpoint_location: str | None = None,
        query_name: str | None = None,
        watermark: tuple[str, str] | None = None,   # (column, delay)
        transform_fn: Callable[[DataFrame], DataFrame] | None = None,
    ):
        self.source = source
        self.sink = sink
        self.output_mode = output_mode
        self.trigger = trigger
        self.checkpoint_location = checkpoint_location
        self.query_name = query_name
        self.watermark = watermark
        self._transform_fn = transform_fn
        self.spark: SparkSession | None = None

    def set_spark_session(self, spark: SparkSession) -> "StreamingPipeline":
        self.spark = spark
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        return self._transform_fn(df) if self._transform_fn else df

    def start_stream(self) -> StreamingQuery:
        """Assemble and start; returns the StreamingQuery handle."""
        if self.spark is None:
            raise RuntimeError("call set_spark_session(spark) first")
        df = self.source.read_stream(self.spark)
        if self.watermark:
            col, delay = self.watermark
            df = df.withWatermark(col, delay)
        df = self.transform(df)
        writer = self.sink.write_stream(df).outputMode(self.output_mode.value)
        if self.checkpoint_location:
            writer = writer.option("checkpointLocation", self.checkpoint_location)
        if self.query_name:
            writer = writer.queryName(self.query_name)
        if self.trigger:
            writer = self.trigger.apply(writer)
        return writer.start()

    def run(self, timeout_s: float | None = None) -> None:
        """Blocking form (awaitTermination)."""
        query = self.start_stream()
        if timeout_s is not None:
            query.awaitTermination(timeout_s)
        else:
            query.awaitTermination()
