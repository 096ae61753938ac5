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


def test_read_source_nanos_pins_utc(spark):
    """ADVICE r2: a non-UTC session reading a nanos-ts source through
    read_source must produce the same instants as table() — the ntz
    branch may not be interpreted in the stray session timezone."""
    from pyspark_pipeline_framework_spark.io.readers import SourceConfig, read_source, table

    sf = "/root/testdata/sf0.001"
    expected = [r.ts for r in table(spark, sf, "events").select("ts").orderBy("ts").limit(5).collect()]
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        got_df = read_source(
            spark,
            SourceConfig(path=f"{sf}/events.parquet", nanos_ts_cols=["ts"]),
        )
        got = [r.ts for r in got_df.select("ts").orderBy("ts").limit(5).collect()]
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    assert got == expected
