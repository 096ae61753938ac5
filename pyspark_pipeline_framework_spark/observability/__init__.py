from pyspark_pipeline_framework_spark.observability.hooks import (
    CompositeHooks,
    LoggingHooks,
    MetricsHooks,
    NoOpHooks,
    PipelineHooks,
)
from pyspark_pipeline_framework_spark.observability.metrics import InMemoryMetricsRegistry
from pyspark_pipeline_framework_spark.observability.audit import (
    AuditEvent,
    AuditHooks,
    CompositeAuditSink,
    FileAuditSink,
    LoggingAuditSink,
    redact_config,
)

__all__ = [
    "PipelineHooks",
    "NoOpHooks",
    "LoggingHooks",
    "MetricsHooks",
    "CompositeHooks",
    "InMemoryMetricsRegistry",
    "AuditEvent",
    "AuditHooks",
    "LoggingAuditSink",
    "FileAuditSink",
    "CompositeAuditSink",
    "redact_config",
]
