import pytest

from pyspark_pipeline_framework_spark.session import SessionScope
from pyspark_pipeline_framework_spark.observability.exporters import (
    OpenTelemetryMetricsRegistry,
    PrometheusMetricsRegistry,
)


def test_injected_session_not_stopped(spark):
    with SessionScope(spark=spark) as s:
        assert s is spark
    # still usable after exit — injected sessions are never stopped
    assert spark.range(1).count() == 1


def test_exporters_import_gated():
    # neither client library is installed in this container
    with pytest.raises(ImportError, match="prometheus_client"):
        PrometheusMetricsRegistry()
    with pytest.raises(ImportError, match="opentelemetry"):
        OpenTelemetryMetricsRegistry()


def test_nanos_conf_scoped_to_read(spark, sf_dir):
    """Reading a nanos-timestamp table must not leave the legacy
    nanosAsLong conf set session-wide (unrelated parquet reads would
    silently get bigint columns for TIMESTAMP(NANOS) data)."""
    from pyspark_pipeline_framework_spark.io.readers import table

    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    ev = table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None) is None
    assert ev.count() > 0  # lazy execution still works after restore
