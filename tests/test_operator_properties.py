"""Property tests for the custom join operators against pure-Python
references on randomized small inputs (hypothesis) — the reference's
§5.3 technique applied to the operators Spark lacks natively."""

from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from pyspark_pipeline_framework_spark.operators.joins import asof_join, range_join, salted_join

BASE = datetime(2024, 1, 1)

events_strategy = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 3600)),  # (key, seconds offset)
    min_size=0,
    max_size=25,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(left=events_strategy, right=events_strategy)
def test_asof_join_matches_python_reference(spark, left, right):
    # unique (key, ts) on the right — operator contract
    right = list({(k, s) for k, s in right})
    ldf = spark.createDataFrame(
        [(i, k, BASE + timedelta(seconds=s)) for i, (k, s) in enumerate(left)],
        "lid long, k int, lts timestamp",
    )
    rdf = spark.createDataFrame(
        [(k, BASE + timedelta(seconds=s), float(s)) for k, s in right],
        "k int, rts timestamp, rv double",
    )
    if not left:
        return
    got = {
        (r.lid, r.rv)
        for r in asof_join(ldf, rdf, key="k", left_ts="lts", right_ts="rts",
                           right_values=["rv"], how="inner").collect()
    }
    expected = set()
    for i, (k, s) in enumerate(left):
        candidates = [rs for rk, rs in right if rk == k and rs <= s]
        if candidates:
            expected.add((i, float(max(candidates))))
    assert got == expected


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=events_strategy)
def test_range_join_matches_python_reference(spark, rows):
    df = spark.createDataFrame(
        [(i, BASE + timedelta(seconds=s)) for i, (_, s) in enumerate(rows)],
        "id long, ts timestamp",
    )
    if not rows:
        return
    left = df.select("id", "ts")
    right = df.select(F.col("id").alias("rid"), F.col("ts").alias("rts"))
    got = {
        (r.id, r.rid)
        for r in range_join(left, right, left_ts="ts", right_ts="rts",
                            lower="0 SECOND", upper="10 MINUTE",
                            bucket_seconds=60).collect()
    }
    secs = [s for _, s in rows]
    expected = {
        (i, j)
        for i, si in enumerate(secs)
        for j, sj in enumerate(secs)
        if si < sj <= si + 600
    }
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    left=st.lists(st.integers(0, 5), min_size=0, max_size=30),
    right=st.lists(st.tuples(st.integers(0, 5), st.integers(0, 100)), min_size=0, max_size=10),
)
def test_salted_join_equals_plain_join(spark, left, right):
    ldf = spark.createDataFrame([(i, k) for i, k in enumerate(left)], "lid long, k long")
    rdf = spark.createDataFrame(right, "k long, v long") if right else (
        spark.createDataFrame([], "k long, v long")
    )
    plain = {(r.lid, r.v) for r in ldf.join(rdf, "k").collect()}
    salted = {(r.lid, r.v) for r in salted_join(ldf, rdf, on=["k"], salt=4).collect()}
    assert plain == salted


def test_operators_on_empty_frames(spark):
    eleft = spark.createDataFrame([], "k int, ts timestamp")
    eright = spark.createDataFrame([], "k int, rts timestamp, rv double")
    assert asof_join(eleft, eright, "k", "ts", "rts", ["rv"]).count() == 0
    assert range_join(
        eleft.select("ts"), eright.select("rts"),
        "ts", "rts", "0 SECOND", "1 MINUTE", 60,
    ).count() == 0
    assert salted_join(eleft, eright.select("k", "rv"), on=["k"]).count() == 0


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n_tokens=st.integers(1, 40),
    chunk=st.integers(2, 12),
    overlap_frac=st.floats(0.0, 0.9),
)
def test_chunking_covers_and_reconstructs(spark, n_tokens, chunk, overlap_frac):
    """Properties on random sizes: every token lands in >= 1 chunk;
    stripping the overlap from chunks 1..n reconstructs the original
    token stream exactly; all full chunks have exactly chunk_tokens."""
    from pyspark_pipeline_framework_spark.llm.packing import chunk_documents

    overlap = min(int(chunk * overlap_frac), chunk - 1)
    stride = chunk - overlap
    text = " ".join(f"t{i}" for i in range(n_tokens))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sorted(
        chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect(),
        key=lambda r: r.chunk_id,
    )
    toks = text.split()
    # reconstruction: first chunk whole, then drop each later chunk's
    # overlapping prefix
    rebuilt = rows[0].chunk_text.split()
    for r in rows[1:]:
        rebuilt.extend(r.chunk_text.split()[overlap:])
    assert rebuilt == toks
    # chunk starts advance by stride; every chunk except the last is full
    for i, r in enumerate(rows[:-1]):
        assert r.n_chunk_tokens == min(chunk, n_tokens - i * stride)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vec=st.lists(
        st.floats(-1e3, 1e3, allow_nan=False, allow_infinity=False, width=32),
        min_size=1,
        max_size=16,
    )
)
def test_quantize_error_bound(spark, vec):
    from pyspark_pipeline_framework_spark.llm.similarity import quantize_embeddings

    df = spark.createDataFrame([(1, vec)], "vec_id int, embedding array<float>")
    r = quantize_embeddings(df).collect()[0]
    assert all(-127 <= q <= 127 for q in r.q_embedding)
    if r.q_scale == 0.0:
        assert all(q == 0 for q in r.q_embedding)
    else:
        for orig, q in zip(vec, r.q_embedding):
            # float32 storage: compare against the float32-rounded input
            import struct

            orig32 = struct.unpack("f", struct.pack("f", orig))[0]
            assert abs(orig32 - q * r.q_scale) <= r.q_scale * (1 + 1e-9)


# ------------------------------------------------- skew robustness (r3 #3)

@pytest.mark.parametrize("salt", [8, 16])
def test_salted_join_spreads_pathological_skew(spark, salt):
    """A 100:1 hot key must NOT land on one reducer under salted_join:
    the max post-shuffle partition stays within ~2.5× the median
    partition, and far below the unsalted hot-partition size. AQE and
    broadcast are disabled so the raw shuffle partitioning is observable
    (AQE's skew-join split is the production default for MODERATE skew;
    salting is the explicit escape hatch for a single pathological key —
    see README 'Skewed joins')."""
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.adaptive.enabled",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.shuffle.partitions",
        )
    }
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.shuffle.partitions", "64")
    try:
        n_keys, hot_rows, cold_rows = 200, 20_000, 100
        left = (
            spark.range(hot_rows).select(F.lit(0).alias("k"), F.col("id").alias("v"))
            .unionByName(
                spark.range(n_keys * cold_rows).select(
                    (F.col("id") % (n_keys - 1) + 1).cast("long").alias("k"),
                    F.col("id").alias("v"),
                )
            )
        )
        right = spark.range(n_keys).select(F.col("id").alias("k"), F.lit("dim").alias("name"))

        def partition_sizes(df):
            rows = (
                df.withColumn("pid", F.spark_partition_id())
                .groupBy("pid").count().collect()
            )
            return sorted(r["count"] for r in rows)

        plain = partition_sizes(left.join(right, ["k"]))
        salted = partition_sizes(salted_join(left, right, on=["k"], salt=salt))

        assert sum(plain) == sum(salted)  # identical result cardinality
        # the unsalted plan concentrates the whole hot key on one reducer
        assert plain[-1] >= hot_rows
        # salted: max task ≤ collision-factor × (ideal hot spread +
        # mean background) — a hot partition may receive ~2 of the salt
        # sub-keys by hash collision, never the whole key
        ideal = hot_rows / salt + sum(salted) / len(salted)
        assert salted[-1] <= 2.5 * ideal, (salted[-1], ideal)
        assert salted[-1] <= plain[-1] / 3
    finally:
        for k, v in saved.items():
            conf.set(k, v)


_ws = st.sampled_from([" ", "  ", "\t", "\n", " \t "])
_word = st.text(alphabet="abcXYZ09.@-", min_size=1, max_size=6)
_texty = st.lists(st.tuples(_ws, _word), min_size=0, max_size=8).map(
    lambda ps: "".join(a + b for a, b in ps)
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=st.lists(_texty, min_size=1, max_size=6))
def test_normalize_text_idempotent_and_ws_invariant(spark, texts):
    """normalize(normalize(x)) == normalize(x), and injecting extra
    whitespace anywhere never changes the canonical form — the
    contract exact dedup keys rely on (r6: collapse-before-trim made
    this hold for edge tabs/newlines too)."""
    from pyspark_pipeline_framework_spark.llm.text import normalize_text

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, text string")
    out = df.select(
        "i",
        normalize_text("text").alias("n1"),
        normalize_text(normalize_text("text")).alias("n2"),
        normalize_text(
            F.concat(F.lit("\t "), F.regexp_replace("text", r" ", "  "),
                     F.lit(" \n"))
        ).alias("n3"),
    ).collect()
    for r in out:
        assert r.n1 == r.n2, (texts[r.i], r.n1, r.n2)
        assert r.n1 == r.n3, (texts[r.i], r.n1, r.n3)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(parts=st.lists(st.sampled_from(
    ["contact a@b.com now", "ip 10.0.0.1 seen", "ssn 123-45-6789",
     "call 555-123-4567", "plain words only", "x@y.org 192.168.1.1"]),
    min_size=1, max_size=4))
def test_pii_redact_idempotent(spark, parts):
    """redact(redact(x)) == redact(x): replacement tokens contain no
    digits or @, so no rule can re-match inside an earlier rule's
    output — the property that makes the fixed rule order safe."""
    from pyspark_pipeline_framework_spark.llm.text import pii_redact

    df = spark.createDataFrame([(0, " ".join(parts))], "i long, text string")
    once = pii_redact(df, out_col="r1")
    twice = pii_redact(once, text_col="r1", out_col="r2").collect()[0]
    assert twice.r1 == twice.r2


def test_not_in_anti_join_null_key_equivalence(spark):
    """Q16's NOT-IN-as-left_anti rewrite (suite/tpch3.py): with an
    injected NULL key in the excluded set, the implementation's
    explicit isNotNull filter makes Spark agree with DuckDB on the
    null-filtered subquery — and the test pins WHY the filter is
    there: strict SQL NOT IN over a subquery containing NULL excludes
    EVERY row (three-valued logic), a semantics no sane exclusion
    list wants and one the isNotNull filter sidesteps."""
    import duckdb
    from pyspark.sql import functions as F

    sup = spark.createDataFrame(
        [(1, -5.0), (None, -7.0), (3, 10.0), (4, -1.0)],
        "s_suppkey int, s_acctbal double",
    )
    li = spark.createDataFrame([(1,), (2,), (3,), (4,)], "l_suppkey int")
    complained = sup.filter(
        (F.col("s_acctbal") < 0) & F.col("s_suppkey").isNotNull()
    ).select("s_suppkey")
    got = sorted(
        r.l_suppkey
        for r in li.join(
            F.broadcast(complained),
            li.l_suppkey == complained.s_suppkey,
            "left_anti",
        ).collect()
    )

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE supplier AS SELECT * FROM (VALUES (1, -5.0),"
        " (NULL, -7.0), (3, 10.0), (4, -1.0)) t(s_suppkey, s_acctbal)"
    )
    con.execute(
        "CREATE TABLE lineitem AS SELECT * FROM (VALUES (1), (2), (3), (4))"
        " t(l_suppkey)"
    )
    want = [
        r[0]
        for r in con.execute(
            "SELECT l_suppkey FROM lineitem WHERE l_suppkey NOT IN ("
            " SELECT s_suppkey FROM supplier"
            " WHERE s_acctbal < 0 AND s_suppkey IS NOT NULL)"
            " ORDER BY l_suppkey"
        ).fetchall()
    ]
    assert got == want == [2, 3]
    # the divergence the filter exists to avoid: strict NOT IN with a
    # NULL in the subquery returns ZERO rows
    strict = con.execute(
        "SELECT count(*) FROM lineitem WHERE l_suppkey NOT IN ("
        " SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)"
    ).fetchone()[0]
    assert strict == 0


# ---- global_range_frame: the scale-safe replacement for a global
# ---- Window.orderBy().rangeBetween() (r8 VERDICT item 1). Property:
# ---- identical results to the single-partition plan it replaces, for
# ---- any data (ties, negatives, boundary-exact gaps), both aggregates,
# ---- and any legal bin_width.

values_strategy = st.lists(
    st.integers(-30, 30).map(lambda i: i * 0.5),  # ties + exact boundary hits
    min_size=1,
    max_size=40,
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=values_strategy,
    # frames including the current row, leading-only, trailing-only,
    # point frames — the r9 item-5 generalization must match the
    # native single-partition window for ALL of them
    frame=st.sampled_from([
        (-3, 0), (0, 2), (-1, 1), (-5, 0),
        (1, 3), (-4, -2), (2, 2), (0, 0), (5, 30),
    ]),
    widen=st.sampled_from([None, 2.0, 7.5]),
)
def test_global_range_frame_matches_global_window(spark, vals, frame, widen):
    from pyspark.sql import Window

    from pyspark_pipeline_framework_spark.operators.windows import global_range_frame

    lo, hi = frame
    bin_width = None if widen is None else max(hi - lo, 1) * widen
    df = spark.createDataFrame(
        [(i, v, float(i % 3)) for i, v in enumerate(vals)], "id long, v double, x double"
    )
    w = Window.orderBy("v").rangeBetween(lo, hi)
    want_cnt = {
        (r.id, r.n) for r in df.select("id", F.count(F.lit(1)).over(w).alias("n")).collect()
    }
    got_cnt = {
        (r.n_got, r.n)
        for r in global_range_frame(
            df, "v", lo, hi, agg="count", key_cols=["id"], bin_width=bin_width,
            result_col="n",
        ).selectExpr("id as n_got", "n").collect()
    }
    assert got_cnt == want_cnt
    for agg, fn in (("sum", F.sum), ("min", F.min), ("max", F.max)):
        want = {
            (r.id, r.s) for r in df.select("id", fn("x").over(w).alias("s")).collect()
        }
        got = {
            (r.id, r.s)
            for r in global_range_frame(
                df, "v", lo, hi, agg=agg, value_col="x", key_cols=["id"],
                bin_width=bin_width, result_col="s",
            ).select("id", "s").collect()
        }
        assert got == want, agg
    # native fused avg: x values are small exact ints in double, so
    # CAST(sum AS DOUBLE)/count equals the built-in AVG bit-for-bit
    want_avg = {
        (r.id, r.a) for r in df.select("id", F.avg("x").over(w).alias("a")).collect()
    }
    got_avg = {
        (r.id, r.a)
        for r in global_range_frame(
            df, "v", lo, hi, agg="avg", value_col="x", key_cols=["id"],
            bin_width=bin_width, result_col="a",
        ).select("id", "a").collect()
    }
    assert got_avg == want_avg


def test_global_range_frame_avg_skips_nulls(spark):
    """AVG ignores NULL values: the fused count channel must weight
    only rows whose value is present — per frame, in every bin case."""
    from pyspark.sql import Window

    from pyspark_pipeline_framework_spark.operators.windows import global_range_frame

    rows = [(i, float(i), None if i % 3 == 0 else float(i * 2)) for i in range(12)]
    df = spark.createDataFrame(rows, "id long, v double, x double")
    for lo, hi in ((-2, 0), (1, 3), (-3, -1)):
        w = Window.orderBy("v").rangeBetween(lo, hi)
        for agg, fn in (("avg", F.avg), ("sum", F.sum)):
            want = {(r.id, r.a) for r in df.select("id", fn("x").over(w).alias("a")).collect()}
            got = {
                (r.id, r.a)
                for r in global_range_frame(
                    df, "v", lo, hi, agg=agg, value_col="x", key_cols=["id"],
                    result_col="a",
                ).select("id", "a").collect()
            }
            assert got == want, (agg, lo, hi)
    # empty frame: SUM/AVG stay NULL, never 0 (the r10 probe-coalesce
    # regression: a lone row with a leading frame summed to 0.0)
    one = spark.createDataFrame([(0, 0.0, 0.0)], "id long, v double, x double")
    for agg in ("sum", "avg"):
        r = global_range_frame(
            one, "v", 1, 3, agg=agg, value_col="x", key_cols=["id"],
            result_col="a",
        ).select("a").collect()
        assert r[0].a is None, agg
    r = global_range_frame(
        one, "v", 1, 3, agg="count", key_cols=["id"], result_col="a"
    ).select("a").collect()
    assert r[0].a == 0


def test_global_range_frame_rejects_bad_args(spark):
    from pyspark_pipeline_framework_spark.operators.windows import global_range_frame

    df = spark.createDataFrame([(1, 1.0)], "id long, v double")
    with pytest.raises(ValueError, match="lower <= upper"):
        global_range_frame(df, "v", 2.0, 1.0, key_cols=["id"])
    with pytest.raises(ValueError, match="whole numbers"):
        global_range_frame(df, "v", -1.5, 0.0, key_cols=["id"])
    with pytest.raises(ValueError, match="bin_width"):
        global_range_frame(df, "v", -1.0, 0.0, key_cols=["id"], bin_width=0.5)
    with pytest.raises(ValueError, match="key_cols"):
        global_range_frame(df, "v", -1.0, 0.0)
    with pytest.raises(ValueError, match="value_col"):
        global_range_frame(df, "v", -1.0, 0.0, agg="sum", key_cols=["id"])
    with pytest.raises(ValueError, match="value_col"):
        global_range_frame(df, "v", -1.0, 0.0, agg="min", key_cols=["id"])
    with pytest.raises(ValueError, match="value_col"):
        global_range_frame(df, "v", -1.0, 0.0, agg="avg", key_cols=["id"])
    with pytest.raises(ValueError, match="'count', 'sum', 'min', 'max' or 'avg'"):
        global_range_frame(df, "v", -1.0, 0.0, agg="median", key_cols=["id"])
    # previously-rejected shapes that are now legal: leading-only,
    # point frame with defaulted bin width
    assert "n" in global_range_frame(
        df, "v", 1.0, 2.0, agg="count", key_cols=["id"], result_col="n"
    ).columns
    assert "n" in global_range_frame(
        df, "v", 0.0, 0.0, agg="count", key_cols=["id"], result_col="n"
    ).columns


def test_global_range_frame_null_order_values(spark):
    """NULL order values form their own peer group in Spark's range
    frames (never joining numeric frames). global_range_frame preserves
    that: bin(NULL) is its own partition and NULL probes are filtered
    (NULL != NULL), so null rows see exactly the null peer group —
    pinned against the naive global window."""
    from pyspark.sql import Window

    from pyspark_pipeline_framework_spark.operators.windows import global_range_frame

    data = [(0, 1.0, 1.0), (1, None, 2.0), (2, 2.5, 3.0),
            (3, None, 4.0), (4, 3.0, 5.0), (5, 2.0, 1.5)]
    df = spark.createDataFrame(data, "id long, v double, x double")
    w = Window.orderBy("v").rangeBetween(-2, 0)
    want = sorted(
        (r.id, r.n, r.s)
        for r in df.select(
            "id", F.count(F.lit(1)).over(w).alias("n"), F.sum("x").over(w).alias("s")
        ).collect()
    )
    cnt = global_range_frame(df, "v", -2, 0, agg="count", key_cols=["id"],
                             result_col="n")
    sm = global_range_frame(df, "v", -2, 0, agg="sum", value_col="x",
                            key_cols=["id"], result_col="s")
    got = sorted(
        (r.id, r.n, r2.s)
        for r, r2 in zip(cnt.orderBy("id").collect(), sm.orderBy("id").collect())
    )
    assert got == want
