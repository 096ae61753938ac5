"""Stateful streaming operators: state carried across micro-batches,
bounded-state dedup."""

import time

from pyspark_pipeline_framework_spark.streaming import (
    FileStreamingSource,
    MemoryStreamingSink,
    OutputMode,
    StreamingPipeline,
    Trigger,
    TriggerType,
)
from pyspark_pipeline_framework_spark.streaming.stateful import (
    running_counts,
    streaming_dedup,
)


def test_streaming_dedup_within_watermark(spark, tmp_path):
    src_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ck")
    rows = [
        ("2024-01-01 00:00:00", "a"),
        ("2024-01-01 00:00:10", "a"),   # dup key within watermark → dropped
        ("2024-01-01 00:00:20", "b"),
    ]
    spark.createDataFrame(rows, "ts_str string, k string").coalesce(1).write.json(src_dir)

    def dedup(df):
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.to_timestamp("ts_str"))
        return streaming_dedup(df, ["k"], "ts", "1 minute").select("k")

    StreamingPipeline(
        source=FileStreamingSource(src_dir, file_format="json", schema="ts_str STRING, k STRING"),
        sink=MemoryStreamingSink("dedup_out"),
        trigger=Trigger(TriggerType.AVAILABLE_NOW),
        checkpoint_location=ckpt,
        transform_fn=dedup,
    ).set_spark_session(spark).run(timeout_s=60)
    out = sorted(r.k for r in spark.table("dedup_out").collect())
    assert out == ["a", "b"]


def test_stream_stream_join_with_time_bound(spark, tmp_path):
    """Watermarked stream-stream inner join with an event-time range
    condition — the state-bounded join pattern (SURVEY §2.6 gap)."""
    from pyspark.sql import functions as F

    imp_dir, clk_dir, ckpt = str(tmp_path / "imp"), str(tmp_path / "clk"), str(tmp_path / "ck")
    spark.createDataFrame(
        [("ad1", "2024-01-01 00:00:00"), ("ad2", "2024-01-01 00:10:00")],
        "ad string, ts_str string",
    ).coalesce(1).write.json(imp_dir)
    spark.createDataFrame(
        [("ad1", "2024-01-01 00:02:00"),   # within 5 min of impression → joins
         ("ad2", "2024-01-01 00:30:00")],  # 20 min later → dropped
        "ad string, ts_str string",
    ).coalesce(1).write.json(clk_dir)

    schema = "ad STRING, ts_str STRING"
    imp = (
        spark.readStream.format("json").schema(schema).load(imp_dir)
        .select("ad", F.to_timestamp("ts_str").alias("imp_ts"))
        .withWatermark("imp_ts", "1 hour")
    )
    clk = (
        spark.readStream.format("json").schema(schema).load(clk_dir)
        .select(F.col("ad").alias("c_ad"), F.to_timestamp("ts_str").alias("clk_ts"))
        .withWatermark("clk_ts", "1 hour")
    )
    joined = imp.join(
        clk,
        (F.col("ad") == F.col("c_ad"))
        & (F.col("clk_ts") >= F.col("imp_ts"))
        & (F.col("clk_ts") <= F.col("imp_ts") + F.expr("INTERVAL 5 MINUTES")),
        "inner",
    ).select("ad", "imp_ts", "clk_ts")

    query = (
        joined.writeStream.format("memory").queryName("ss_join")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(60)
    rows = spark.table("ss_join").collect()
    assert [r.ad for r in rows] == ["ad1"]


def test_running_counts_across_batches(spark, tmp_path):
    """Two micro-batches (maxFilesPerTrigger=1) → state must carry the
    first batch's counts into the second."""
    src_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ck")
    spark.createDataFrame([("u1", 1.0), ("u1", 2.0)], "k string, v double") \
        .coalesce(1).write.mode("overwrite").json(src_dir + "/f1")
    spark.createDataFrame([("u1", 4.0), ("u2", 8.0)], "k string, v double") \
        .coalesce(1).write.mode("overwrite").json(src_dir + "/f2")

    pipe = StreamingPipeline(
        source=FileStreamingSource(
            src_dir, file_format="json", schema="k STRING, v DOUBLE",
            options={"maxFilesPerTrigger": "1", "recursiveFileLookup": "true"},
        ),
        sink=MemoryStreamingSink("running_out"),
        output_mode=OutputMode.UPDATE,
        trigger=Trigger(TriggerType.AVAILABLE_NOW),
        checkpoint_location=ckpt,
        transform_fn=lambda df: running_counts(df, "k", "v"),
    )
    pipe.set_spark_session(spark).run(timeout_s=90)
    rows = spark.table("running_out").collect()
    # last emission per key reflects cumulative state
    final = {}
    for r in rows:
        final[r.key] = (r.n, r.total)
    assert final["u1"] == (3, 7.0)
    assert final["u2"] == (1, 8.0)


def test_running_counts_transform_with_state(spark, tmp_path):
    """Same contract on the MODERN state API (Spark 4
    transformWithStateInPandas + ValueState + RocksDB provider):
    results must match the legacy applyInPandasWithState operator.
    Skipped when protobuf (pyspark's state-server protocol dependency)
    is absent — this container ships without it; the operator itself
    fails loudly in that case (asserted below)."""
    import pytest as _pytest

    from pyspark_pipeline_framework_spark.streaming.stateful import running_counts_tws

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        df = spark.createDataFrame([("u", 1.0)], "k string, v double")
        with _pytest.raises(ImportError, match="protobuf"):
            running_counts_tws(df, "k", "v")
        _pytest.skip("protobuf not installed: transformWithState state "
                     "server unavailable in this container")

    src_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ck")
    spark.createDataFrame([("u1", 1.0), ("u1", 2.0)], "k string, v double") \
        .coalesce(1).write.mode("overwrite").json(src_dir + "/f1")
    spark.createDataFrame([("u1", 4.0), ("u2", 8.0)], "k string, v double") \
        .coalesce(1).write.mode("overwrite").json(src_dir + "/f2")

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        pipe = StreamingPipeline(
            source=FileStreamingSource(
                src_dir, file_format="json", schema="k STRING, v DOUBLE",
                options={"maxFilesPerTrigger": "1", "recursiveFileLookup": "true"},
            ),
            sink=MemoryStreamingSink("running_tws_out"),
            output_mode=OutputMode.UPDATE,
            trigger=Trigger(TriggerType.AVAILABLE_NOW),
            checkpoint_location=ckpt,
            transform_fn=lambda df: running_counts_tws(df, "k", "v"),
        )
        pipe.set_spark_session(spark).run(timeout_s=120)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    final = {}
    for r in spark.table("running_tws_out").collect():
        final[r.key] = (r.n, r.total)
    assert final["u1"] == (3, 7.0)
    assert final["u2"] == (1, 8.0)
