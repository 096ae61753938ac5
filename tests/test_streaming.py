"""Streaming integration tests on locally-runnable sources/sinks (rate,
file, memory, foreachBatch) — reference pattern
tests/integration/test_streaming_spark.py: availableNow triggers +
bounded awaits, never open-ended streams."""

import json
import time

import pytest
from pyspark.sql import functions as F

from pyspark_pipeline_framework_spark.streaming import (
    FileStreamingSink,
    FileStreamingSource,
    ForeachBatchSink,
    MemoryStreamingSink,
    OutputMode,
    RateStreamingSource,
    StreamingPipeline,
    Trigger,
    TriggerType,
    attach_listener,
)
from pyspark_pipeline_framework_spark.streaming.hooks import NoOpStreamingHooks


def _wait_for(predicate, timeout_s=30.0, interval=0.25):
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        if predicate():
            return True
        time.sleep(interval)
    return False


def test_trigger_validation():
    with pytest.raises(ValueError):
        Trigger(TriggerType.PROCESSING_TIME)
    with pytest.raises(ValueError):
        Trigger(TriggerType.CONTINUOUS)
    Trigger(TriggerType.ONCE)
    Trigger(TriggerType.AVAILABLE_NOW)


def test_rate_to_memory_with_transform(spark):
    pipe = StreamingPipeline(
        source=RateStreamingSource(rows_per_second=100, num_partitions=2),
        sink=MemoryStreamingSink("rate_doubled"),
        output_mode=OutputMode.APPEND,
        transform_fn=lambda df: df.select("timestamp", (F.col("value") * 2).alias("doubled")),
        query_name="rate_doubled",
    )
    query = pipe.set_spark_session(spark).start_stream()
    try:
        assert _wait_for(lambda: spark.table("rate_doubled").count() > 0)
        rows = spark.table("rate_doubled").limit(50).collect()
        assert all(r.doubled % 2 == 0 for r in rows)
    finally:
        query.stop()


def test_file_stream_available_now(spark, tmp_path):
    src_dir, out_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    df = spark.createDataFrame([(1, "Alice"), (2, "Bob"), (3, "Carol")], "id long, name string")
    df.coalesce(1).write.json(src_dir)

    pipe = StreamingPipeline(
        source=FileStreamingSource(src_dir, file_format="json", schema="id LONG, name STRING"),
        sink=FileStreamingSink(out_dir, file_format="parquet"),
        trigger=Trigger(TriggerType.AVAILABLE_NOW),
        checkpoint_location=ckpt,
    )
    pipe.set_spark_session(spark).run(timeout_s=60)
    out = spark.read.parquet(out_dir)
    assert {r.name for r in out.collect()} == {"Alice", "Bob", "Carol"}


def test_foreach_batch_sink(spark, tmp_path):
    src_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ck")
    spark.createDataFrame([(i,) for i in range(10)], "v long").coalesce(1).write.json(src_dir)
    seen: list[tuple[int, int]] = []

    pipe = StreamingPipeline(
        source=FileStreamingSource(src_dir, file_format="json", schema="v LONG"),
        sink=ForeachBatchSink(lambda batch, bid: seen.append((bid, batch.count()))),
        trigger=Trigger(TriggerType.AVAILABLE_NOW),
        checkpoint_location=ckpt,
    )
    pipe.set_spark_session(spark).run(timeout_s=60)
    assert sum(n for _, n in seen) == 10


def test_watermarked_windowed_agg(spark, tmp_path):
    """Event-time tumbling window + watermark over a file stream —
    the operators added beyond the reference (SURVEY.md §2.6)."""
    src_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ck")
    rows = [(f"2024-01-01 00:{m:02d}:00", "click") for m in range(10)]
    spark.createDataFrame(rows, "ts_str string, kind string").coalesce(1).write.json(src_dir)

    def windowed(df):
        df = df.withColumn("ts", F.to_timestamp("ts_str"))
        return df.withWatermark("ts", "1 minute").groupBy(
            F.window("ts", "5 minutes").alias("win"), "kind"
        ).agg(F.count(F.lit(1)).alias("n"))

    pipe = StreamingPipeline(
        source=FileStreamingSource(src_dir, file_format="json", schema="ts_str STRING, kind STRING"),
        sink=MemoryStreamingSink("windowed_counts"),
        output_mode=OutputMode.COMPLETE,
        trigger=Trigger(TriggerType.AVAILABLE_NOW),
        checkpoint_location=ckpt,
        transform_fn=windowed,
    )
    pipe.set_spark_session(spark).run(timeout_s=60)
    out = {(r.win.start.minute, r.n) for r in spark.table("windowed_counts").collect()}
    assert out == {(0, 5), (5, 5)}


def test_streaming_listener_hooks(spark, tmp_path):
    events = {"started": 0, "progress": 0, "terminated": 0}

    class Recorder(NoOpStreamingHooks):
        def on_query_start(self, query_id, name):
            events["started"] += 1

        def on_batch_progress(self, query_id, batch_id, num_rows, duration_ms):
            events["progress"] += 1

        def on_query_terminated(self, query_id, exception):
            events["terminated"] += 1

    listener = attach_listener(spark, Recorder())
    try:
        src_dir = str(tmp_path / "in")
        spark.createDataFrame([(1,)], "v long").write.json(src_dir)
        pipe = StreamingPipeline(
            source=FileStreamingSource(src_dir, file_format="json", schema="v LONG"),
            sink=MemoryStreamingSink("listener_probe"),
            trigger=Trigger(TriggerType.AVAILABLE_NOW),
            checkpoint_location=str(tmp_path / "ck"),
        )
        pipe.set_spark_session(spark).run(timeout_s=60)
        assert _wait_for(lambda: events["started"] >= 1 and events["terminated"] >= 1)
        assert events["progress"] >= 1
    finally:
        spark.streams.removeListener(listener)


def test_stream_stream_join_time_bounded(spark, tmp_path):
    """Watermarked stream-stream inner join with a time-range bound —
    impressions joined to clicks within 10 minutes (the bounded-state
    shape from SURVEY.md §2.6's add-on list)."""
    from pyspark_pipeline_framework_spark.streaming import stream_stream_join

    imp_dir, clk_dir, ckpt = str(tmp_path / "imp"), str(tmp_path / "clk"), str(tmp_path / "ck")
    imps = [("a", "2024-01-01 00:00:00"), ("b", "2024-01-01 00:05:00")]
    clks = [
        ("a", "2024-01-01 00:04:00"),   # within 10m of impression a -> match
        ("b", "2024-01-01 00:30:00"),   # 25m after impression b -> no match
    ]
    spark.createDataFrame(imps, "ad string, imp_ts_s string").coalesce(1).write.json(imp_dir)
    spark.createDataFrame(clks, "ad string, clk_ts_s string").coalesce(1).write.json(clk_dir)

    left = (
        spark.readStream.schema("ad STRING, imp_ts_s STRING").json(imp_dir)
        .withColumn("imp_ts", F.to_timestamp("imp_ts_s"))
    )
    right = (
        spark.readStream.schema("ad STRING, clk_ts_s STRING").json(clk_dir)
        .withColumn("clk_ts", F.to_timestamp("clk_ts_s"))
    )
    joined = stream_stream_join(
        left, right, on="ad", left_ts="imp_ts", right_ts="clk_ts",
        watermark="1 minute", within="10 minutes",
    )
    q = (
        joined.select("ad", "imp_ts", "clk_ts")
        .writeStream.format("memory").queryName("ss_join")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = spark.table("ss_join").collect()
    assert [(r.ad, r.clk_ts.minute) for r in rows] == [("a", 4)]


def test_stream_stream_join_refuses_unbounded(spark, tmp_path):
    from pyspark_pipeline_framework_spark.streaming import stream_stream_join

    d = str(tmp_path / "s")
    spark.createDataFrame([("a", "2024-01-01 00:00:00")], "k string, ts_s string").write.json(d)
    s = (
        spark.readStream.schema("k STRING, ts_s STRING").json(d)
        .withColumn("ts", F.to_timestamp("ts_s"))
    )
    with pytest.raises(ValueError, match="unbounded"):
        stream_stream_join(s, s, on="k", left_ts="ts", right_ts="ts", within=None)
    with pytest.raises(ValueError, match="time bound"):
        stream_stream_join(s, s, on="k", left_ts="ts", right_ts="ts", within=None, how="leftOuter")


def test_stream_static_join_broadcast(spark, tmp_path):
    from pyspark_pipeline_framework_spark.streaming import stream_static_join

    src, ckpt = str(tmp_path / "in"), str(tmp_path / "ck")
    spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], "k long, v string").coalesce(1).write.json(src)
    dim = spark.createDataFrame([(1, "one"), (2, "two")], "k long, name string")
    stream = spark.readStream.schema("k LONG, v STRING").json(src)
    q = (
        stream_static_join(stream, dim, on="k")
        .writeStream.format("memory").queryName("ss_static")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    assert {(r.k, r.name) for r in spark.table("ss_static").collect()} == {(1, "one"), (2, "two")}


def test_config_declared_stream_component(spark, tmp_path):
    """`op: stream` — a config-only Structured Streaming pipeline:
    file json source → SQL transform over view `stream` → parquet file
    sink, available_now trigger (bounded, batch-like completion),
    driven through the batch runner + CLI config path."""
    import json as _json

    from pyspark_pipeline_framework_spark.plans.config import PipelineConfig
    from pyspark_pipeline_framework_spark.plans.result import PipelineStatus
    from pyspark_pipeline_framework_spark.plans.runner import PipelineRunner
    from pyspark_pipeline_framework_spark.resilience.presets import NO_RETRY

    src_dir = tmp_path / "in"
    src_dir.mkdir()
    (src_dir / "a.json").write_text(
        "\n".join(_json.dumps({"id": i, "v": i * 10}) for i in range(10))
    )
    out_dir = str(tmp_path / "out")
    cfg = PipelineConfig.from_dict(
        {
            "name": "stream-demo",
            "mode": "streaming",
            "components": [
                {
                    "name": "ingest",
                    "op": "stream",
                    "component_type": "source",
                    "params": {
                        "source": {
                            "type": "file",
                            "path": str(src_dir),
                            "file_format": "json",
                            "schema": "id long, v long",
                        },
                        "transform_sql": "SELECT id, v FROM stream WHERE v >= 20",
                        "sink": {"type": "file", "path": out_dir},
                        "trigger": "available_now",
                        "checkpoint": str(tmp_path / "ckpt"),
                    },
                }
            ],
        }
    )
    result = PipelineRunner(cfg, spark, resilience=NO_RETRY).run()
    assert result.status == PipelineStatus.SUCCESS
    out = spark.read.parquet(out_dir)
    assert out.count() == 8
    assert out.agg({"v": "min"}).collect()[0][0] == 20


def test_stream_config_errors_are_loud(spark):
    from pyspark_pipeline_framework_spark.streaming.config import (
        StreamingConfigError,
        build_sink,
        build_source,
        build_trigger,
        run_stream_component,
    )

    with pytest.raises(StreamingConfigError, match="unknown source type"):
        build_source({"type": "pulsar"})
    with pytest.raises(StreamingConfigError, match="unknown sink type"):
        build_sink({"type": "mq"})
    with pytest.raises(StreamingConfigError, match="unknown trigger"):
        build_trigger("sometimes")
    with pytest.raises(StreamingConfigError, match="'type' field"):
        build_trigger({"interval": "5 seconds"})
    with pytest.raises(StreamingConfigError, match="output_mode"):
        run_stream_component(
            spark,
            source={"type": "rate"},
            sink={"type": "console"},
            output_mode="sideways",
        )
    with pytest.raises(StreamingConfigError, match="'type' field"):
        build_source({"path": "/x"})


# ---------------------------------------------------- batch↔stream parity

def _stream_windowed(spark, tmp_path, name: str, transform_sql: str):
    """Drive the op:stream path (file parquet source → SQL window agg →
    memory sink, complete mode, available_now) over the same events
    table the batch cases read, and return the result table."""
    import shutil as _sh

    from pyspark_pipeline_framework_spark.streaming.config import run_stream_component

    src_dir = tmp_path / "events_in"
    src_dir.mkdir()
    _sh.copy("/root/testdata/sf0.001/events.parquet", src_dir / "events.parquet")
    run_stream_component(
        spark,
        source={
            "type": "file",
            "path": str(src_dir),
            "file_format": "parquet",
            "schema": (
                "event_id long, ts timestamp, user_id long, "
                "event_type string, value double, props string"
            ),
        },
        transform_sql=transform_sql,
        sink={"type": "memory", "table_name": name},
        output_mode="complete",
        trigger="available_now",
        checkpoint=str(tmp_path / "ckpt"),
    )
    return spark.table(name)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_batch_parity_tumbling(spark, tmp_path):
    """The batch-oracled tumbling-window aggregation and the identical
    computation run as a stream must agree bit-for-bit (reference
    pattern: tests/integration/test_streaming_spark.py:131-174)."""
    from pyspark_pipeline_framework_spark.suite.windows import q_win_tumbling

    batch = q_win_tumbling(spark, "/root/testdata/sf0.001")
    streamed = _stream_windowed(
        spark, tmp_path, "parity_tumbling",
        """
        SELECT window(ts, '1 day').start AS win_start, event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
        FROM stream GROUP BY window(ts, '1 day'), event_type
        """,
    )
    assert _rows(streamed) == _rows(batch)


def test_stream_batch_parity_sliding(spark, tmp_path):
    from pyspark_pipeline_framework_spark.suite.windows import q_win_sliding

    batch = q_win_sliding(spark, "/root/testdata/sf0.001")
    streamed = _stream_windowed(
        spark, tmp_path, "parity_sliding",
        """
        SELECT window(ts, '1 day', '12 hours').start AS win_start,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM stream GROUP BY window(ts, '1 day', '12 hours')
        """,
    )
    assert _rows(streamed) == _rows(batch)


def test_stream_batch_parity_session(spark, tmp_path):
    from pyspark_pipeline_framework_spark.suite.windows import q_win_session

    batch = q_win_session(spark, "/root/testdata/sf0.001")
    streamed = _stream_windowed(
        spark, tmp_path, "parity_session",
        """
        SELECT user_id,
               session_window(ts, '30 minutes').start AS session_start,
               session_window(ts, '30 minutes').end AS session_end,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM stream GROUP BY user_id, session_window(ts, '30 minutes')
        """,
    )
    assert _rows(streamed) == _rows(batch)


def test_watermark_drops_late_data_across_restarts(spark, tmp_path):
    """Append-mode windowed agg with watermark, driven as two
    available_now runs over one checkpoint: the watermark persisted by
    run 1 must (a) release the closed windows in run 2 and (b) DROP a
    late event that arrives behind the watermark — the core late-data
    contract a 100 TB streaming pipeline relies on."""
    import json as _json

    from pyspark_pipeline_framework_spark.streaming.config import run_stream_component

    src_dir = tmp_path / "in"
    src_dir.mkdir()
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")

    def run_once():
        run_stream_component(
            spark,
            source={
                "type": "file",
                "path": str(src_dir),
                "file_format": "json",
                "schema": "ts timestamp, kind string",
            },
            transform_sql="""
              SELECT window(ts, '5 minutes').start AS win_start,
                     CAST(COUNT(*) AS BIGINT) AS n
              FROM stream
              GROUP BY window(ts, '5 minutes')
            """,
            sink={"type": "file", "path": out_dir},
            output_mode="append",
            trigger="available_now",
            watermark={"column": "ts", "delay": "1 minute"},
            checkpoint=ckpt,
        )

    # run 1: 10 on-time events 10:00..10:09 → watermark persists at 10:08
    (src_dir / "a.json").write_text(
        "\n".join(
            _json.dumps({"ts": f"2024-01-01T10:{m:02d}:00", "kind": "x"})
            for m in range(10)
        )
    )
    run_once()

    # run 2: one event at 10:20 (advances the watermark, closing both
    # 10:0x windows) and one LATE event at 09:00 (behind the persisted
    # 10:08 watermark → must be dropped, its window never appears)
    (src_dir / "b.json").write_text(
        _json.dumps({"ts": "2024-01-01T10:20:00", "kind": "x"})
        + "\n"
        + _json.dumps({"ts": "2024-01-01T09:00:00", "kind": "late"})
    )
    run_once()

    out = {
        (r.win_start.hour, r.win_start.minute): r.n
        for r in spark.read.parquet(out_dir).collect()
    }
    assert out.get((10, 0)) == 5 and out.get((10, 5)) == 5  # closed windows emitted
    assert (9, 0) not in out                                # late event dropped
    assert (10, 20) not in out                              # open window not emitted


def test_config_declared_dedup_within_watermark_parity(spark, tmp_path):
    """Declarative dropDuplicatesWithinWatermark (`dedup_keys`): a file
    stream with injected duplicate keys, run under available_now,
    emits exactly the batch exact-dedup key set — one row per key —
    and state is watermark-bounded by construction (SURVEY §2.6 lists
    the op as not-implemented in the reference; Spark 3.5+ has it
    native)."""
    import json as _json

    from pyspark_pipeline_framework_spark.plans.config import PipelineConfig
    from pyspark_pipeline_framework_spark.plans.result import PipelineStatus
    from pyspark_pipeline_framework_spark.plans.runner import PipelineRunner
    from pyspark_pipeline_framework_spark.resilience.presets import NO_RETRY

    src_dir = tmp_path / "in"
    src_dir.mkdir()
    # 30 rows over 10 keys (each key 3x, same event time ordering)
    rows = [
        {"k": i % 10, "v": i, "ts": f"2024-01-01T00:{i:02d}:00"}
        for i in range(30)
    ]
    (src_dir / "a.json").write_text("\n".join(_json.dumps(r) for r in rows))
    out_dir = str(tmp_path / "out")
    cfg = PipelineConfig.from_dict(
        {
            "name": "stream-dedup",
            "mode": "streaming",
            "components": [
                {
                    "name": "dedup",
                    "op": "stream",
                    "component_type": "source",
                    "params": {
                        "source": {
                            "type": "file",
                            "path": str(src_dir),
                            "file_format": "json",
                            "schema": "k long, v long, ts timestamp",
                        },
                        "watermark": {"column": "ts", "delay": "10 minutes"},
                        "dedup_keys": ["k"],
                        "sink": {"type": "file", "path": out_dir},
                        "trigger": "available_now",
                        "checkpoint": str(tmp_path / "ckpt"),
                    },
                }
            ],
        }
    )
    result = PipelineRunner(cfg, spark, resilience=NO_RETRY).run()
    assert result.status == PipelineStatus.SUCCESS
    out = spark.read.parquet(out_dir)
    # parity with batch exact dedup: one row per key, same key set
    batch = spark.createDataFrame(
        [(r["k"], r["v"]) for r in rows], "k long, v long"
    ).dropDuplicates(["k"])
    assert sorted(r.k for r in out.select("k").collect()) == sorted(
        r.k for r in batch.select("k").collect()
    )
    assert out.count() == 10


def test_dedup_keys_config_validation():
    import pytest as _pytest

    from pyspark_pipeline_framework_spark.streaming.config import (
        StreamingConfigError,
        validate_stream_params,
    )

    base = {
        "source": {"type": "rate"},
        "sink": {"type": "memory", "table_name": "q"},
    }
    with _pytest.raises(StreamingConfigError, match="requires a watermark"):
        validate_stream_params({**base, "dedup_keys": ["k"]})
    with _pytest.raises(StreamingConfigError, match="non-empty list"):
        validate_stream_params(
            {**base, "watermark": {"column": "ts", "delay": "1 minute"},
             "dedup_keys": []}
        )


def test_ivf_add_dim_rejects_bool():
    """bool subclasses int: `dim: true` must not validate as dim=1
    (r9 ADVICE — same strictness as every other int field)."""
    import pytest as _pytest

    from pyspark_pipeline_framework_spark.streaming.config import (
        StreamingConfigError,
        validate_stream_params,
    )

    params = {
        "source": {"type": "rate"},
        "checkpoint": "/tmp/ck",
        "ivf_add": {"store": "/tmp/s", "centroids": "/tmp/c", "dim": True},
    }
    with _pytest.raises(StreamingConfigError, match="positive int"):
        validate_stream_params(params)
    with _pytest.raises(StreamingConfigError, match="positive int"):
        validate_stream_params(
            {**params, "ivf_add": {**params["ivf_add"], "dim": 0}}
        )


def test_incremental_store_partition_by_validation():
    """partition_by on the incremental-store blocks (layout mirroring,
    r9 ADVICE): non-empty list of column names or load-time failure."""
    import pytest as _pytest

    from pyspark_pipeline_framework_spark.streaming.config import (
        StreamingConfigError,
        validate_stream_params,
    )

    ivf = {
        "source": {"type": "rate"},
        "checkpoint": "/tmp/ck",
        "ivf_add": {"store": "/tmp/s", "centroids": "/tmp/c", "dim": 8},
    }
    validate_stream_params(
        {**ivf, "ivf_add": {**ivf["ivf_add"], "partition_by": ["cell"]}}
    )
    for bad in ([], "cell", [1], [""]):
        with _pytest.raises(StreamingConfigError, match="partition_by"):
            validate_stream_params(
                {**ivf, "ivf_add": {**ivf["ivf_add"], "partition_by": bad}}
            )
    nd = {
        "source": {"type": "rate"},
        "checkpoint": "/tmp/ck",
        "neardup": {"store": "/tmp/s", "pairs": "/tmp/p"},
    }
    validate_stream_params(
        {**nd, "neardup": {**nd["neardup"], "partition_by": ["band_idx"]}}
    )
    with _pytest.raises(StreamingConfigError, match="partition_by"):
        validate_stream_params(
            {**nd, "neardup": {**nd["neardup"], "partition_by": []}}
        )
