"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline: broadcast the (small)
query set, score every corpus vector, rank-filter per query — one scan
of the corpus, zero shuffle of the corpus rows before the final top-k.

The scale path is :func:`cosine_topk_lsh`: random-hyperplane LSH
buckets (deterministic hash-derived hyperplanes, JVM-side) prune the
corpus so each query only scores its bucket's candidates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot_decimal(a: Column, b: Column) -> Column:
    """Exact, order-independent dot product: per-element double product
    (IEEE-deterministic) cast to DECIMAL(30,14), summed via aggregate.
    Matches a DuckDB oracle doing the same decimal(38,14) sum.

    Precision 30, not 38: Spark widens decimal addition to
    (p+1, s) and only once past precision 38 starts REDUCING the scale
    (38,14)+(38,14) → (38,13), which silently rounds every fold step.
    At (30,14) the addition stays exact and the re-cast is lossless."""
    prods = F.zip_with(
        a, b, lambda x, y: (x.cast("double") * y.cast("double")).cast("decimal(30,14)")
    )
    return F.aggregate(
        prods,
        F.lit(0).cast("decimal(30,14)"),
        lambda acc, v: (acc + v).cast("decimal(30,14)"),
    ).cast("double")


def _norm(v: Column) -> Column:
    return F.sqrt(_dot_decimal(v, v))


def cosine_similarity(a: Column, b: Column) -> Column:
    return _dot_decimal(a, b) / (_norm(a) * _norm(b))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` is broadcast (bounded side); the corpus is scanned once
    with map-side scoring, then a single shuffle for the per-query
    rank-filter. Excludes self-matches when ids collide."""
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qvec")
    )
    scored = corpus.join(F.broadcast(q), F.col(query_id_col) != F.col(id_col)).select(
        query_id_col,
        id_col,
        cosine_similarity(F.col("__qvec"), F.col(vec_col)).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


def embedding_dedup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    block_col: str | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (a < b) pairs with
    cosine ≥ ``threshold``.

    ``block_col`` bounds the join (pairs are only formed within a
    block — a cluster id, LSH bucket, or shard key); without it this is
    a full self-join and only safe on small corpora. The 100 TB recipe:
    ``lsh_bucket`` as the block column, then this as the exact verify
    stage — same candidate/verify split as MinHash + Jaccard."""
    a = corpus.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
        *( [F.col(block_col).alias("__blk")] if block_col else [] ),
    )
    b = corpus.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
        *( [F.col(block_col).alias("__blk")] if block_col else [] ),
    )
    cond = F.col("id_a") < F.col("id_b")
    joined = a.join(b, ["__blk"]).filter(cond) if block_col else a.join(b, cond)
    return (
        joined.select(
            "id_a",
            "id_b",
            cosine_similarity(F.col("__va"), F.col("__vb")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def _hyperplane(dim: int, plane: int) -> Column:
    """Deterministic pseudo-random hyperplane: component j derived from
    xxhash64(j, plane) mapped to [-1, 1]. No stored model, identical on
    every executor."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            F.xxhash64(j.cast("string"), F.lit(str(plane))).cast("double")
            / F.lit(float(2**63))
        ),
    )


def lsh_bucket(vec_col: Column, dim: int, n_planes: int = 8, table: int = 0) -> Column:
    """Random-hyperplane LSH bucket id: n_planes sign bits packed into a
    long. Cosine-similar vectors collide with high probability.
    ``table`` seeds an independent hash table (OR-construction)."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        h = _hyperplane(dim, table * n_planes + p)
        dot = F.aggregate(
            F.zip_with(vec_col, h, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket.bitwiseOR(
            F.when(dot > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(F.lit(0).cast("long"))
        )
    return bucket


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: only corpus vectors sharing an LSH bucket with
    the query (in ANY of ``n_tables`` independent tables — the standard
    OR-construction; recall ≈ 1-(1-p^planes)^tables) are scored.

    At 100 TB this turns a full-corpus scan per query into a bucket
    equi-join: candidates ≈ n_tables · corpus/2^n_planes per query —
    tune the two knobs against the recall target."""
    def buckets(v: Column) -> Column:
        return F.array(
            *[
                F.struct(
                    F.lit(t).alias("t"),
                    lsh_bucket(v, dim, n_planes, table=t).alias("b"),
                )
                for t in range(n_tables)
            ]
        )

    cb = corpus.select(
        id_col, vec_col, F.explode(buckets(F.col(vec_col))).alias("__bkt")
    )
    qb = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qvec"),
        F.explode(buckets(F.col(vec_col))).alias("__bkt"),
    )
    candidates = (
        cb.join(F.broadcast(qb), "__bkt")
        .filter(F.col(query_id_col) != F.col(id_col))
        .select(query_id_col, id_col, "__qvec", vec_col)
        .dropDuplicates([query_id_col, id_col])  # don't score a pair per table
    )
    scored = candidates.select(
        query_id_col,
        id_col,
        cosine_similarity(F.col("__qvec"), F.col(vec_col)).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )
