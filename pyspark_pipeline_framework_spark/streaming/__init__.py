from pyspark_pipeline_framework_spark.streaming.base import (
    OutputMode,
    StreamingPipeline,
    Trigger,
    TriggerType,
)
from pyspark_pipeline_framework_spark.streaming.sources import (
    DeltaStreamingSource,
    EventHubsStreamingSource,
    FileStreamingSource,
    IcebergStreamingSource,
    KafkaStreamingSource,
    KinesisStreamingSource,
    RateStreamingSource,
    StreamingSource,
)
from pyspark_pipeline_framework_spark.streaming.sinks import (
    CloudStorageStreamingSink,
    ConsoleStreamingSink,
    DeltaStreamingSink,
    FileStreamingSink,
    ForeachBatchSink,
    IcebergStreamingSink,
    KafkaStreamingSink,
    MemoryStreamingSink,
    StreamingSink,
)
from pyspark_pipeline_framework_spark.streaming.joins import (
    stream_static_join,
    stream_stream_join,
)
from pyspark_pipeline_framework_spark.streaming.hooks import (
    CompositeStreamingHooks,
    LoggingStreamingHooks,
    NoOpStreamingHooks,
    StreamingHooks,
    attach_listener,
)

__all__ = [
    "OutputMode",
    "StreamingPipeline",
    "Trigger",
    "TriggerType",
    "StreamingSource",
    "KafkaStreamingSource",
    "FileStreamingSource",
    "DeltaStreamingSource",
    "IcebergStreamingSource",
    "RateStreamingSource",
    "EventHubsStreamingSource",
    "KinesisStreamingSource",
    "StreamingSink",
    "KafkaStreamingSink",
    "DeltaStreamingSink",
    "ConsoleStreamingSink",
    "IcebergStreamingSink",
    "FileStreamingSink",
    "CloudStorageStreamingSink",
    "ForeachBatchSink",
    "MemoryStreamingSink",
    "StreamingHooks",
    "NoOpStreamingHooks",
    "LoggingStreamingHooks",
    "CompositeStreamingHooks",
    "attach_listener",
    "stream_stream_join",
    "stream_static_join",
]
