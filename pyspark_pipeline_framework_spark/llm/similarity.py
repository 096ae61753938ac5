"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline: broadcast the (small)
query set, score every corpus vector, rank-filter per query — one scan
of the corpus, zero shuffle of the corpus rows before the final top-k.

Two scale paths prune the corpus so each query only scores a candidate
subset: :func:`cosine_topk_lsh` (random-hyperplane buckets, stateless)
and :func:`cosine_topk_ivf` (IVF-Flat: a trained coarse quantizer of
``nlist`` centroids; queries probe the ``nprobe`` nearest cells).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pyspark_pipeline_framework_spark.operators.partitioning import ensure_parallelism


#: fixed-point scale for exact dot products: products are quantized to
#: 14 decimals as longs, so sums are exact integer arithmetic in any
#: order, overflow-free for |element| ≲ 3 at dim ≤ ~10k, and fast
#: (primitive long codegen — a DECIMAL fold costs ~10× more via
#: BigDecimal objects)
_DOT_SCALE = 1e14


def _dot_decimal(a: Column, b: Column) -> Column:
    """Exact, order-independent dot product: per-element double product
    (IEEE-deterministic), quantized via floor(p·1e14) to a long, summed
    as integers, rescaled once. A DuckDB oracle doing literally the same
    (FLOOR to BIGINT, list_sum, /1e14) matches bit-for-bit — floor is
    used because CAST(double AS BIGINT) truncates in Spark but rounds
    in DuckDB."""
    prods = F.zip_with(
        a,
        b,
        lambda x, y: F.floor(x.cast("double") * y.cast("double") * F.lit(_DOT_SCALE)),
    )
    total = F.aggregate(prods, F.lit(0).cast("long"), lambda acc, v: acc + v)
    return total.cast("double") / F.lit(_DOT_SCALE)


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
        F.col(query_id_col),
        F.col(vec_col).alias("__qvec"),
        _norm(F.col(vec_col)).alias("__qn"),
    )
    c = ensure_parallelism(corpus).select(
        F.col(id_col), F.col(vec_col).alias("__cvec"), _norm(F.col(vec_col)).alias("__cn")
    )
    scored = c.join(F.broadcast(q), F.col(query_id_col) != F.col(id_col)).select(
        query_id_col,
        id_col,
        (
            _dot_decimal(F.col("__qvec"), F.col("__cvec")) / (F.col("__qn") * F.col("__cn"))
        ).alias("cos_sim"),
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
    # norms are computed ONCE per vector before the pair join — per-pair
    # cosine is then a single dot-product fold (3× fewer decimal folds)
    normed = ensure_parallelism(corpus).select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        _norm(F.col(vec_col)).alias("__n"),
        *([F.col(block_col).alias("__blk")] if block_col else []),
    )
    a = normed.select(
        F.col("__id").alias("id_a"), F.col("__v").alias("__va"), F.col("__n").alias("__na"),
        *([F.col("__blk")] if block_col else []),
    )
    b = normed.select(
        F.col("__id").alias("id_b"), F.col("__v").alias("__vb"), F.col("__n").alias("__nb"),
        *([F.col("__blk")] if block_col else []),
    )
    cond = F.col("id_a") < F.col("id_b")
    joined = a.join(b, ["__blk"]).filter(cond) if block_col else a.join(b, cond)
    return (
        joined.select(
            "id_a",
            "id_b",
            (
                _dot_decimal(F.col("__va"), F.col("__vb"))
                / (F.col("__na") * F.col("__nb"))
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


_LSH_SEED = 20240501


def _hyperplanes(dim: int, n_planes: int, n_tables: int):
    """Deterministic Gaussian hyperplanes (seeded generator — identical
    on every executor, no stored model)."""
    rng = np.random.default_rng(_LSH_SEED)
    return rng.standard_normal((n_tables * n_planes, dim))


def lsh_buckets_udf(dim: int, n_planes: int = 8, n_tables: int = 8):
    """Vectorized bucket assignment: one Arrow-batched matmul computes
    every table's sign-bit bucket per vector (array<long>, one element
    per table). This is the sanctioned Python fast path — the per-row
    expression-tree alternative costs n_tables·n_planes array folds."""
    H = _hyperplanes(dim, n_planes, n_tables).T  # (dim, tables*planes)
    weights = (1 << np.arange(n_planes)).astype("int64")

    @F.pandas_udf("array<long>")
    def buckets(v: pd.Series) -> pd.Series:
        M = np.stack(v.values).astype("float64")          # (batch, dim)
        signs = (M @ H) > 0                               # (batch, tables*planes)
        per_table = [
            signs[:, t * n_planes : (t + 1) * n_planes] @ weights for t in range(n_tables)
        ]
        B = np.stack(per_table, axis=1)                   # (batch, tables)
        return pd.Series(list(B))

    return buckets


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
    bucketer = lsh_buckets_udf(dim, n_planes, n_tables)

    def with_buckets(df: DataFrame, idc: str, vec_alias: str, norm_alias: str) -> DataFrame:
        # posexplode: (table idx, bucket) pairs join only within a table
        return df.select(
            F.col(idc),
            F.col(vec_col).alias(vec_alias),
            _norm(F.col(vec_col)).alias(norm_alias),
            F.posexplode(bucketer(F.col(vec_col))).alias("__t", "__b"),
        )

    cb = with_buckets(ensure_parallelism(corpus), id_col, "__cvec", "__cn")
    qb = with_buckets(queries, query_id_col, "__qvec", "__qn")
    candidates = (
        cb.join(F.broadcast(qb), ["__t", "__b"])
        .filter(F.col(query_id_col) != F.col(id_col))
        .select(query_id_col, id_col, "__qvec", "__qn", "__cvec", "__cn")
        .dropDuplicates([query_id_col, id_col])  # don't score a pair per table
    )
    scored = candidates.select(
        query_id_col,
        id_col,
        (
            _dot_decimal(F.col("__qvec"), F.col("__cvec")) / (F.col("__qn") * F.col("__cn"))
        ).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )

_IVF_SEED = 20240502


def ivf_cells_udf(centroids: np.ndarray, nprobe: int):
    """Arrow-batched coarse quantizer: for each vector, the ``nprobe``
    cell ids with the largest dot product against the (unit-norm,
    broadcast-in-closure) centroid matrix, best first. Vector norm is
    constant across cells, so dot-argmax == cosine-argmax."""
    C = centroids.T  # (dim, nlist)

    @F.pandas_udf("array<int>")
    def cells(v: pd.Series) -> pd.Series:
        M = np.stack(v.values).astype("float64")       # (batch, dim)
        scores = M @ C                                 # (batch, nlist)
        top = np.argsort(-scores, axis=1, kind="stable")[:, :nprobe].astype("int32")
        return pd.Series(list(top))

    return cells


def ivf_train_centroids(
    corpus: DataFrame,
    dim: int,
    nlist: int = 16,
    train_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample: int | None = None,
) -> np.ndarray:
    """Train an IVF coarse quantizer with ``train_iters`` Lloyd steps
    over a bounded, deterministically-sampled training set.

    The FAISS-style scale contract: k-means never sees the full corpus.
    The training set is the ``train_sample`` (default
    ``max(64·nlist, 1024)``) corpus vectors with the smallest
    ``xxhash64(id, seed)`` — a seeded uniform sample that is a pure
    function of the ids, so it is independent of partitioning, needs no
    stored state, and flows through ``TakeOrderedAndProject`` (per-
    partition top-N, no full shuffle; at 100 TB the driver receives the
    sample, never the corpus). Lloyd then runs on the driver in numpy:
    single-threaded fixed-order reductions, so the model — the
    ``nlist × dim`` array that must be broadcast anyway — is
    bit-identical across runs and partitionings. One Spark job total,
    versus one distributed assign+mean pass per iteration.

    Seeding matches the sample order: the first ``nlist`` sampled
    vectors (smallest hashes) are the initial centroids. Empty cells
    keep their previous centroid."""
    n_train = train_sample or max(64 * nlist, 1024)
    rows = (
        corpus.select(
            F.col(vec_col).alias("__v"),
            F.xxhash64(F.col(id_col).cast("string"), F.lit(_IVF_SEED)).alias("__h"),
            F.col(id_col).alias("__id"),
        )
        .orderBy("__h", "__id")
        .limit(n_train)
        .collect()
    )
    X = np.stack([np.asarray(r["__v"], dtype="float64") for r in rows])
    C = X[:nlist].copy()
    C /= np.linalg.norm(C, axis=1, keepdims=True) + 1e-12

    for _ in range(train_iters):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(nlist):
            members = X[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
        C /= np.linalg.norm(C, axis=1, keepdims=True) + 1e-12
    return C


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    train_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF-Flat approximate top-k: corpus vectors live in exactly one
    of ``nlist`` cells; each query scores only the vectors in its
    ``nprobe`` closest cells (recall rises with nprobe, work falls with
    nlist — candidates ≈ corpus · nprobe / nlist).

    Versus LSH: one candidate row per (query, corpus) pair by
    construction (a corpus vector has ONE cell), so no dedup shuffle;
    the cell equi-join is the only wide operation before the top-k
    window. The trained model concentrates candidates where density
    is, which beats data-oblivious hyperplanes on clustered corpora."""
    C = ivf_train_centroids(
        corpus, dim, nlist=nlist, train_iters=train_iters, id_col=id_col, vec_col=vec_col
    )
    assign1 = ivf_cells_udf(C, 1)
    probe = ivf_cells_udf(C, nprobe)

    cb = ensure_parallelism(corpus).select(
        F.col(id_col),
        F.col(vec_col).alias("__cvec"),
        _norm(F.col(vec_col)).alias("__cn"),
        assign1(F.col(vec_col)).getItem(0).alias("__cell"),
    )
    qb = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qvec"),
        _norm(F.col(vec_col)).alias("__qn"),
        F.explode(probe(F.col(vec_col))).alias("__cell"),
    )
    scored = (
        cb.join(F.broadcast(qb), "__cell")
        .filter(F.col(query_id_col) != F.col(id_col))
        .select(
            query_id_col,
            id_col,
            (
                _dot_decimal(F.col("__qvec"), F.col("__cvec"))
                / (F.col("__qn") * F.col("__cn"))
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )
