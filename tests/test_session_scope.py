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
