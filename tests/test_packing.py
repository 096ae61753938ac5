"""Sequence packing + deterministic split behavior."""

import pytest
from pyspark.sql import functions as F

from pyspark_pipeline_framework_spark.io.readers import table
from pyspark_pipeline_framework_spark.llm.packing import pack_sequences, split_by_hash
from pyspark_pipeline_framework_spark.llm.text import token_count_ws


@pytest.fixture(scope="module")
def docs_tokens(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", token_count_ws("text").alias("n_tokens"))


def test_packing_respects_budget(spark, docs_tokens):
    packed = pack_sequences(docs_tokens, max_tokens=128, num_shards=8)
    sums = (
        packed.groupBy("shard", "pack_id")
        .agg(F.sum("n_tokens").alias("tot"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    for r in sums:
        assert r.tot <= 128 or r.n == 1  # only oversized singletons may exceed
    # every doc packed exactly once
    assert packed.count() == docs_tokens.count()
    assert packed.select("doc_id").distinct().count() == docs_tokens.count()


def test_packing_is_deterministic(spark, docs_tokens):
    a = {(r.doc_id): (r.shard, r.pack_id) for r in pack_sequences(docs_tokens, 128).collect()}
    b = {(r.doc_id): (r.shard, r.pack_id) for r in pack_sequences(docs_tokens, 128).collect()}
    assert a == b


def test_packing_fills_reasonably(spark, docs_tokens):
    """Greedy packing should waste < half the budget on average for
    docs much smaller than the budget."""
    stats = docs_tokens.agg(F.max("n_tokens"), F.sum("n_tokens")).first()
    max_doc, total = stats[0], stats[1]
    budget = max(256, max_doc + 1)
    packed = pack_sequences(docs_tokens, max_tokens=budget, num_shards=4)
    n_packs = packed.select("shard", "pack_id").distinct().count()
    assert n_packs <= 2 * (total // budget + 4 + 1)  # ≥50% fill + shard slack


def test_split_by_hash(spark, docs_tokens):
    split = split_by_hash(docs_tokens, "doc_id", {"train": 0.8, "valid": 0.1, "test": 0.1})
    counts = {r.split: r["count"] for r in split.groupBy("split").count().collect()}
    n = docs_tokens.count()
    assert set(counts) <= {"train", "valid", "test"}
    assert counts["train"] > 0.6 * n
    # deterministic
    again = split_by_hash(docs_tokens, "doc_id", {"train": 0.8, "valid": 0.1, "test": 0.1})
    assert {r.doc_id: r.split for r in split.collect()} == {
        r.doc_id: r.split for r in again.collect()
    }
    with pytest.raises(ValueError):
        split_by_hash(docs_tokens, "doc_id", {"a": 0.5})

def test_stratified_sample_rate_and_determinism(spark, docs_tokens):
    from pyspark_pipeline_framework_spark.llm.packing import stratified_sample

    n = docs_tokens.count()
    s1 = stratified_sample(docs_tokens, rate=0.5, id_col="doc_id")
    k = s1.count()
    assert 0.3 * n < k < 0.7 * n  # binomial(n, 0.5) well within ±0.2n
    # deterministic: identical keep-set on every call
    s2 = stratified_sample(docs_tokens, rate=0.5, id_col="doc_id")
    assert {r.doc_id for r in s1.collect()} == {r.doc_id for r in s2.collect()}
    # monotone: a smaller rate keeps a subset of a larger rate's rows
    s3 = stratified_sample(docs_tokens, rate=0.2, id_col="doc_id")
    assert {r.doc_id for r in s3.collect()} <= {r.doc_id for r in s1.collect()}
    with pytest.raises(ValueError):
        stratified_sample(docs_tokens, rate=0.0, id_col="doc_id")


def test_split_by_hash_md5_portable(spark, docs_tokens):
    """md5 mode: same API/behavior, buckets recomputable outside Spark."""
    import hashlib

    split = split_by_hash(
        docs_tokens, "doc_id", {"train": 0.8, "valid": 0.1, "test": 0.1}, hash_fn="md5"
    )
    rows = split.collect()
    frac_train = sum(r.split == "train" for r in rows) / len(rows)
    assert 0.7 < frac_train < 0.9
    # bucket recomputed in pure Python matches Spark's assignment
    for r in rows[:50]:
        bucket = int(hashlib.md5(f"{r.doc_id}:split".encode()).hexdigest()[:8], 16) % 10000
        expected = "train" if bucket < 8000 else ("valid" if bucket < 9000 else "test")
        assert r.split == expected, (r.doc_id, bucket, r.split, expected)
    import pytest

    with pytest.raises(ValueError, match="hash_fn"):
        split_by_hash(docs_tokens, "doc_id", {"a": 1.0}, hash_fn="sha1")


def test_packing_shard_budget_raises_with_guidance(spark, docs_tokens):
    """An over-budget shard must fail fast with the corrective
    num_shards in the message, not OOM the executor silently."""
    with pytest.raises(Exception, match="num_shards>=\\d+") as ei:
        pack_sequences(
            docs_tokens, max_tokens=128, num_shards=1, max_rows_per_shard=100
        ).collect()
    assert "max_rows_per_shard=100" in str(ei.value)


def test_packing_auto_shards_stays_under_budget(spark, docs_tokens):
    packed = pack_sequences(
        docs_tokens, max_tokens=128, num_shards="auto", max_rows_per_shard=100
    )
    per_shard = packed.groupBy("shard").count().collect()
    assert max(r["count"] for r in per_shard) <= 100
    assert packed.count() == docs_tokens.count()


def test_packing_budget_validation():
    with pytest.raises(ValueError, match="max_rows_per_shard"):
        pack_sequences(None, max_tokens=1, max_rows_per_shard=0)
    with pytest.raises(ValueError, match="num_shards"):
        pack_sequences(None, max_tokens=1, num_shards=0)
    with pytest.raises(ValueError, match="auto"):
        pack_sequences(None, max_tokens=1, num_shards="auto", max_rows_per_shard=None)


# ------------------------------------------- global shuffle / token budget

def test_global_shuffle_is_a_permutation_and_deterministic(spark):
    from pyspark_pipeline_framework_spark.llm.packing import global_shuffle

    d = spark.createDataFrame([(i, f"doc {i}") for i in range(97)],
                              "doc_id long, text string")
    a = global_shuffle(d, num_shards=4, salt="s1").select("doc_id", "shard", "pos")
    b = global_shuffle(d, num_shards=4, salt="s1").select("doc_id", "shard", "pos")
    ra, rb = sorted(map(tuple, a.collect())), sorted(map(tuple, b.collect()))
    assert ra == rb  # deterministic across runs
    # every row addressed exactly once; per-shard positions are 1..n
    assert len(ra) == 97 and len({t[0] for t in ra}) == 97
    by_shard = {}
    for _, sh, pos in ra:
        by_shard.setdefault(sh, []).append(pos)
    for sh, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), sh
    # a different salt produces a different order
    c = global_shuffle(d, num_shards=4, salt="s2").select("doc_id", "shard", "pos")
    assert sorted(map(tuple, c.collect())) != ra


def test_token_budget_keeps_prefix_within_budget(spark):
    from pyspark_pipeline_framework_spark.llm.packing import sample_to_token_budget

    d = spark.createDataFrame(
        [(i, 10 + (i % 7)) for i in range(200)], "doc_id long, n_tokens int"
    )
    out = sample_to_token_budget(d, budget_tokens=800, num_shards=4).collect()
    per_shard = 800 // 4
    totals = {}
    for r in out:
        assert r.cum_tokens <= per_shard
        totals[r.shard] = max(totals.get(r.shard, 0), r.cum_tokens)
    assert sum(totals.values()) <= 800
    assert sum(totals.values()) > 0
    # determinism: same kept set on re-run
    again = sample_to_token_budget(d, budget_tokens=800, num_shards=4).collect()
    assert sorted((r.doc_id, r.cum_tokens) for r in out) == sorted(
        (r.doc_id, r.cum_tokens) for r in again
    )


def test_token_budget_validation_and_zero_budget(spark):
    from pyspark_pipeline_framework_spark.llm.packing import (
        global_shuffle,
        sample_to_token_budget,
    )

    d = spark.createDataFrame([(1, 5)], "doc_id long, n_tokens int")
    assert sample_to_token_budget(d, budget_tokens=0).count() == 0
    with pytest.raises(ValueError, match="budget_tokens"):
        sample_to_token_budget(d, budget_tokens=-1)
    with pytest.raises(ValueError, match="num_shards"):
        sample_to_token_budget(d, budget_tokens=10, num_shards=0)
    with pytest.raises(ValueError, match="num_shards"):
        global_shuffle(d, num_shards=0)


def test_weighted_sample_fraction_and_weight_contract(spark, sf_dir):
    """Expected kept fraction tracks target; NULL/non-positive weights
    are never kept; invalid target raises; heavier rows keep more."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from pyspark_pipeline_framework_spark.llm.packing import weighted_sample

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = d.count()
    kept = weighted_sample(d, "n_chars", 0.4).count()
    assert 0.25 * n <= kept <= 0.55 * n  # expectation 0.4, generous band
    # weight monotonicity in expectation: uniform weights == stratified-
    # style keep-set at the same rate; heavier-than-average rows keep
    # at a higher rate than lighter ones
    heavy = d.withColumn("w", (F.col("n_chars") > 300).cast("int") * 100 + 1)
    out = weighted_sample(heavy, "w", 0.3)
    heavy_rate = out.where("n_chars > 300").count() / max(
        1, d.where("n_chars > 300").count()
    )
    light_rate = out.where("n_chars <= 300").count() / max(
        1, d.where("n_chars <= 300").count()
    )
    assert heavy_rate > light_rate
    # NULL / zero / negative weights never kept
    bad = d.withColumn(
        "w",
        F.when(F.col("doc_id") % 3 == 0, None)
        .when(F.col("doc_id") % 3 == 1, F.lit(0))
        .otherwise(F.lit(-5)),
    )
    assert weighted_sample(bad, "w", 0.5).count() == 0
    with _pytest.raises(ValueError, match="target_fraction"):
        weighted_sample(d, "n_chars", 0.0)


def test_weighted_sample_renormalization(spark, sf_dir):
    """renormalize_iters redistributes the clipped probability mass:
    (a) k=0 is bit-identical to the default single pass; (b) under
    cap-binding skew the per-row RATES sum to exactly tf·N after
    convergence (computed driver-side with the same float ops);
    (c) the kept set grows monotonically with k (scale only rises);
    (d) when no rate caps, renormalization is a no-op."""
    from pyspark.sql import functions as F

    from pyspark_pipeline_framework_spark.llm.packing import weighted_sample

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "w3",
        (F.col("n_chars").cast("double") * F.col("n_chars")) * F.col("n_chars"),
    )
    ids = lambda df: sorted(r.doc_id for r in df.select("doc_id").collect())  # noqa: E731
    base = ids(weighted_sample(d, "w3", 0.4))
    assert ids(weighted_sample(d, "w3", 0.4, renormalize_iters=0)) == base
    k1 = ids(weighted_sample(d, "w3", 0.4, renormalize_iters=1))
    k2 = ids(weighted_sample(d, "w3", 0.4, renormalize_iters=2))
    assert set(base) <= set(k1) <= set(k2)
    assert len(k2) > len(base)  # skew really binds the cap here

    # driver-side replay of the rates: two iterations must close the
    # clipped-mass gap by orders of magnitude (exact equality needs
    # full fixpoint convergence; a borderline row may remain)
    w = [r.w3 for r in d.select("w3").collect() if r.w3 and r.w3 > 0]
    n, tf = len(w), 0.4
    s0 = sum(w)
    gap0 = abs(sum(min(1.0, tf * n * x / s0) for x in w) - tf * n)
    budget, s = tf * n, s0
    for _ in range(2):
        capped = [x for x in w if budget * x / s >= 1.0]
        budget, s = tf * n - len(capped), sum(x for x in w if budget * x / s < 1.0)
    rates = [1.0 if budget * x / s >= 1.0 else budget * x / s for x in w]
    gap2 = abs(sum(rates) - tf * n)
    assert gap0 > 0.02 * tf * n  # the skew genuinely clips ≥2% of the mass
    assert gap2 < 0.05 * gap0 and gap2 < 1e-3 * tf * n

    # no-op when the cap never binds (linear weights, tf small)
    lin = ids(weighted_sample(d, "n_chars", 0.1))
    lin_k = ids(weighted_sample(d, "n_chars", 0.1, renormalize_iters=3))
    assert lin == lin_k
