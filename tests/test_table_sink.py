"""WriteTable parity: saveAsTable with partitionBy, and bucketBy for
shuffle-free co-located joins (SinkConfig table path)."""

from pyspark.sql import functions as F

from pyspark_pipeline_framework_spark.io.readers import table
from pyspark_pipeline_framework_spark.io.writers import SinkConfig, write_sink


def test_save_as_table_roundtrip(spark, sf_dir):
    src = table(spark, sf_dir, "nation")
    write_sink(src, SinkConfig(format="table", table="t_nation", mode="overwrite",
                               partition_by=["n_regionkey"]))
    try:
        out = spark.table("t_nation")
        assert out.count() == 25
        # partition pruning on the partition column
        pruned = out.filter(F.col("n_regionkey") == 1)
        assert pruned.count() == 5
    finally:
        spark.sql("DROP TABLE IF EXISTS t_nation")


def test_partitioned_parquet_empty_write_readable(spark, sf_dir, tmp_path):
    """A partitionBy parquet write of an EMPTY DataFrame must leave a
    re-readable dataset: Spark's dynamic-partition writer emits one
    file per partition VALUE, so an empty input writes only _SUCCESS
    and spark.read fails with UNABLE_TO_INFER_SCHEMA (regression, r6
    empty-input sweep). The sink now appends a schema-bearing empty
    file; readback yields the full schema (partition column included)
    and zero rows."""
    src = table(spark, sf_dir, "nation").filter("n_nationkey < 0")
    path = str(tmp_path / "empty_nation")
    write_sink(src, SinkConfig(format="parquet", path=path, mode="overwrite",
                               partition_by=["n_regionkey"]))
    out = spark.read.parquet(path)
    assert out.count() == 0
    assert set(out.columns) == {"n_nationkey", "n_name", "n_regionkey"}
    # a later REAL partitioned append on top of the schema-bearing root
    # file reconciles cleanly (Spark merges the file's partition column
    # with the directory-derived one) — the incremental-run lifecycle
    write_sink(table(spark, sf_dir, "nation"),
               SinkConfig(format="parquet", path=path, mode="append",
                          partition_by=["n_regionkey"]))
    out2 = spark.read.parquet(path)
    assert out2.count() == 25
    assert set(out2.columns) == {"n_nationkey", "n_name", "n_regionkey"}


def test_csv_roundtrip_tricky_strings(spark, tmp_path):
    """CSV write→read must preserve commas, quotes, and (with
    multiLine) embedded newlines. Spark's writer and reader both
    default to backslash-escape, but a quote-bearing field written by
    one config and read by another silently corrupts — the sink/source
    now share an RFC 4180 doubled-quote default (r6). Empty-vs-NULL
    needs a sentinel nullValue on both sides; without one both read
    back as NULL (documented)."""
    rows = [(1, "plain"), (2, "with,comma"), (3, 'with"quote'),
            (4, "multi\nline"), (5, "tab\there"), (6, None)]
    df = spark.createDataFrame(rows, "id long, s string")
    path = str(tmp_path / "tricky_csv")
    write_sink(df, SinkConfig(format="csv", path=path, mode="overwrite"))
    from pyspark_pipeline_framework_spark.io.readers import SourceConfig, read_source

    back = read_source(spark, SourceConfig(
        format="csv", path=path,
        schema="id long, s string",
        options={"multiLine": "true"},
    ))
    got = {r.id: r.s for r in back.collect()}
    assert got == dict(rows)


def test_bucket_by_join_avoids_shuffle(spark, sf_dir):
    """Two tables bucketed on the join key join without an Exchange."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    write_sink(o, SinkConfig(format="table", table="t_orders_b", mode="overwrite",
                             bucket_by=(4, ["o_orderkey"]), sort_by=["o_orderkey"]))
    write_sink(l, SinkConfig(format="table", table="t_lineitem_b", mode="overwrite",
                             bucket_by=(4, ["l_orderkey"]), sort_by=["l_orderkey"]))
    try:
        ob, lb = spark.table("t_orders_b"), spark.table("t_lineitem_b")
        joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = joined._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                joined._jdf.queryExecution(), "formatted"
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert joined.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")
