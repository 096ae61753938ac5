"""Lexical retrieval over a document corpus: term postings, TF-IDF and
BM25 scoring, top-k keyword search ([beyond-ref] — the reference has no
retrieval surface; this rounds out the LLM-training-data toolkit next
to dedup/decontamination, e.g. for quality-weighted sampling or
eval-leak auditing by query).

Scale shape (the 100 TB contract):
- the corpus is scanned and tokenized exactly ONCE into postings
  ``(doc, term, tf, dl)`` — one shuffle keyed by ``(doc, term)``;
  document length rides the explode map-side (see
  :func:`doc_postings`), never a second scan or exchange;
- corpus-level constants (N docs, total token count) are a one-row
  aggregate broadcast via ``crossJoin`` (the scalar-subquery pattern
  used throughout the suite — never a driver collect), computed
  map-side from the pre-explode token arrays (:func:`_corpus_stats`)
  so the stats branch never re-executes the postings explode+exchange;
- queries are the SMALL side by definition: query terms broadcast into
  the postings scan, so only postings that match some query term are
  ever scored — the wide score aggregation is keyed by
  ``(query, doc)`` and bounded by matching postings, never corpus
  size × query count;
- document frequencies are computed AFTER the query-term semi-join, so
  the df aggregation touches only needed terms (df per term is
  identical either way — df counts distinct docs in the FULL postings
  table for that term, and the semi-join keeps every posting of a
  needed term).

Determinism (cross-engine oracle gating): ``idf_mode="rational"``
evaluates BM25 with k1=1.2, b=0.75 folded into exact wide-integer
numerators/denominators, one double division each (IEEE division is
exactly rounded → engine-independent), and a fixed-point
``floor(1e6·idf·tf_part)`` per-term score summed as integers — exact
and order-independent, so a DuckDB oracle matches bit-for-bit.
``idf_mode="ln"`` is the classic Robertson/Lucene idf
``ln(1 + (N-df+0.5)/(df+0.5))`` — transcendental, so last-ulp results
may differ across engines; it is the user-facing default in the
registry but the suite gates the rational mode.

The rational-idf algebra (documented so the oracle SQL is auditable):
with ``avgdl = S/N`` (S = total tokens, N = docs),

  idf      = (N - df + ½)/(df + ½)            = (2N - 2df + 1)/(2df + 1)
  tf_part  = tf·(k1+1)/(tf + k1·(1 - b + b·dl/avgdl))
           = 22·S·tf / (10·S·tf + 3·S + 9·dl·N)      [k1=6/5, b=3/4]

Both are ratios of exact integers. The products are computed in
DECIMAL(38,0) on the Spark side and HUGEINT (int128) in the oracle —
still exact (both engines' wide-int→double casts are correctly
rounded; unit-verified in ``tests/test_retrieval.py``), with the
overflow bound now 22·S·tf < 10^38: S·tf < 4.5·10^36, unreachable even
at 100 TB with a pathological multi-billion-tf document (the previous
BIGINT formulation aborted under ANSI mode once S·tf > ~4.2·10^17 —
a tf of ~2·10^4 in one spammy doc at 10^13 corpus tokens).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pyspark_pipeline_framework_spark.llm.dedup import _word_array

__all__ = [
    "doc_postings",
    "bm25_topk",
    "tfidf_topk_terms",
]

#: fixed-point scale for the rational per-term score
_SCORE_SCALE = 1_000_000.0


def _terms(text_col: str) -> Column:
    """Tokens — literally ``llm.dedup._word_array``, imported rather
    than re-implemented so retrieval and the shingle operators can
    never disagree on what a "word" is. Blank docs split to [''] and
    are dropped by the ``term != ''`` filter in :func:`doc_postings`."""
    return _word_array(text_col)


def _nonblank_terms(text_col: str) -> Column:
    """The filtered token array every retrieval operator is defined
    over: :func:`_terms` minus the ``''`` artifact of splitting a blank
    document. Shared by :func:`doc_postings` and :func:`_corpus_stats`
    so the corpus constants can never diverge from the postings table
    the scores are computed over."""
    return F.filter(_terms(text_col), lambda x: x != "")


def doc_postings(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Postings list ``(id, term, tf, dl)``: term frequency per
    document plus the document's token count ``dl``, from ONE corpus
    scan and ONE exchange. ``dl`` is the size of the filtered token
    array, attached map-side to every exploded token row and folded
    into the tf aggregation as ``min`` (constant within a doc) — the
    alternative (window-sum or per-doc re-aggregate of tf) costs a
    second full-postings exchange keyed by doc, which at corpus scale
    is the single biggest avoidable shuffle in the scoring plan."""
    tt = _nonblank_terms(text_col)
    toks = df.select(F.col(id_col).alias("id"), tt.alias("__t")).select(
        "id", F.explode("__t").alias("term"), F.size("__t").alias("__dl")
    )
    return toks.groupBy("id", "term").agg(
        F.count(F.lit(1)).alias("tf"), F.min("__dl").alias("dl")
    )


def _corpus_stats(
    df: DataFrame, id_col: str, text_col: str, with_total: bool
) -> DataFrame:
    """One-row corpus constants for the scoring formulas, WITHOUT
    executing the postings subtree: ``n_docs`` (distinct ids with at
    least one non-blank token — exactly ``countDistinct(id)`` over the
    postings table) and, when ``with_total``, ``s_total`` (total
    non-blank tokens — exactly ``sum(tf)`` over postings, since tf
    partitions the exploded tokens by (id, term)). Computed map-side
    from the pre-explode token arrays: a second corpus scan, but no
    explode and no (id, term) exchange — at 100 TB that exchange is
    the single biggest cost in the old scalar-subquery branch, paid
    again by the scoring pipeline which re-executes postings anyway."""
    sz = F.size(_nonblank_terms(text_col))
    sized = df.select(F.col(id_col).alias("id"), sz.alias("__dl")).where(
        F.col("__dl") > 0
    )
    aggs = [F.countDistinct("id").alias("n_docs")]
    if with_total:
        # sum(int) already widens to long; the cast stays only to pin
        # s_total to the exact type the sum(tf)-over-postings branch
        # produced (oracle schema parity), independent of size()'s type.
        aggs.append(F.sum(F.col("__dl").cast("long")).alias("s_total"))
    return sized.groupBy().agg(*aggs)


def _rational_part(n_docs: Column, s_total: Column, dfreq: Column, tf: Column, dl: Column) -> Column:
    """floor(1e6 · idf · tf_part) as BIGINT — see module docstring.
    Expression shape (two exact-integer casts, two divisions, two
    multiplications, left-associative) is mirrored verbatim in the
    suite oracle; every op is exactly rounded IEEE, so the value is
    engine-independent."""
    idf = (F.lit(2) * n_docs - F.lit(2) * dfreq + F.lit(1)).cast("double") / (
        F.lit(2) * dfreq + F.lit(1)
    ).cast("double")
    # DECIMAL(38,0) keeps the numerator/denominator exact far past
    # BIGINT range (S·tf bound 4.5e36, not 4.2e17 — ANSI-overflow-safe
    # for any real corpus); the decimal→double cast is correctly
    # rounded, so the value is unchanged wherever BIGINT also fit
    s_dec = s_total.cast("decimal(38,0)")
    dl_dec = dl.cast("decimal(38,0)")
    tfp = (F.lit(22) * s_dec * tf).cast("double") / (
        F.lit(10) * s_dec * tf + F.lit(3) * s_dec + F.lit(9) * dl_dec * n_docs
    ).cast("double")
    return F.floor(F.lit(_SCORE_SCALE) * idf * tfp)


def _ln_part(n_docs: Column, s_total: Column, dfreq: Column, tf: Column, dl: Column) -> Column:
    """Classic BM25 term score (Robertson idf, k1=1.2, b=0.75) as a
    double — the user-facing mode; not cross-engine hash-stable
    (ln is transcendental)."""
    nd, dfq, tfd, dld = (c.cast("double") for c in (n_docs, dfreq, tf, dl))
    avgdl = s_total.cast("double") / nd
    idf = F.log(F.lit(1.0) + (nd - dfq + F.lit(0.5)) / (dfq + F.lit(0.5)))
    tfp = (tfd * F.lit(2.2)) / (tfd + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * dld / avgdl))
    return idf * tfp


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    top_k: int = 10,
    idf_mode: str = "rational",
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query",
) -> DataFrame:
    """Top-k BM25 keyword search: score every document containing at
    least one query term against each query; rank per query (score
    desc, doc id asc — deterministic tie-break) and keep ``top_k``.

    Query TERM SET semantics: duplicate terms in a query string count
    once (the common analyzer behavior; qtf weighting would multiply
    the per-term part by query tf — trivially added, deliberately not
    default).

    Returns ``(query_id, doc_id, score_fp BIGINT, rank)`` in rational
    mode (``score_fp`` = sum of floor(1e6·part); monotone in the real
    score at fixed-point resolution) or ``(query_id, doc_id,
    score DOUBLE, rank)`` in ``"ln"`` mode.

    Plan at scale: query terms broadcast once into the postings scan
    (filter + query_id attach in one join), the matched-term df
    aggregate broadcast back, one (query, doc) score shuffle bounded
    by term-matching postings, one per-query rank window.
    """
    if idf_mode not in ("rational", "ln"):
        raise ValueError(f"idf_mode must be 'rational' or 'ln', got {idf_mode!r}")
    post = doc_postings(docs, id_col, text_col)
    stats = _corpus_stats(docs, id_col, text_col, with_total=True)
    qterms = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(_terms(query_text_col)).alias("term"),
        )
        .filter(F.col("term") != "")
        .distinct()
    )
    # only terms some query mentions are ever scored: ONE broadcast
    # join both filters the postings and attaches query_id; df for the
    # matched terms is a small aggregate over it (countDistinct(id) is
    # immune to the per-query row multiplicity), broadcast back
    hits = post.join(F.broadcast(qterms), "term")
    dfreq = hits.groupBy("term").agg(F.countDistinct("id").alias("dfreq"))
    part = _rational_part if idf_mode == "rational" else _ln_part
    score_col = "score_fp" if idf_mode == "rational" else "score"
    scored = (
        hits.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "id")
        .agg(
            F.sum(
                part(
                    F.col("n_docs"), F.col("s_total"), F.col("dfreq"), F.col("tf"), F.col("dl")
                )
            ).alias(score_col)
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col(score_col).desc(), F.col("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", F.col("id").alias(id_col), score_col, "rank")
    )


def tfidf_topk_terms(
    docs: DataFrame,
    top_n: int = 3,
    idf_mode: str = "rational",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The ``top_n`` most characteristic terms per document by TF-IDF.

    ``idf_mode="rational"`` ranks by the log-free monotone surrogate
    ``tf · N / df`` — within one document, ``tf·ln(N/df)`` and
    ``tf·N/df`` induce different orders in general, so this is a
    DOCUMENTED variant chosen for cross-engine exactness: the ranking
    key is ``floor(1e6 · (tf·N as double)/(df as double))``, one exact
    division. ``"ln"`` ranks by standard smoothed
    ``tf · ln(1 + N/df)``. Ties break on term asc.

    Returns ``(id_col, term, tf, dfreq, tfidf_fp|tfidf, rank)``.
    Plan: postings scan + one term-df aggregate joined back (shuffle on
    term — at 100 TB the term dimension is vocabulary-sized, naturally
    bounded), one per-doc rank window.
    """
    if idf_mode not in ("rational", "ln"):
        raise ValueError(f"idf_mode must be 'rational' or 'ln', got {idf_mode!r}")
    post = doc_postings(docs, id_col, text_col).drop("dl")
    stats = _corpus_stats(docs, id_col, text_col, with_total=False)
    dfreq = post.groupBy("term").agg(F.countDistinct("id").alias("dfreq"))
    joined = post.join(dfreq, "term").crossJoin(F.broadcast(stats))
    if idf_mode == "rational":
        key = F.floor(
            F.lit(_SCORE_SCALE)
            * (
                (F.col("tf") * F.col("n_docs")).cast("double")
                / F.col("dfreq").cast("double")
            )
        ).alias("tfidf_fp")
    else:
        key = (
            F.col("tf").cast("double")
            * F.log(F.lit(1.0) + F.col("n_docs").cast("double") / F.col("dfreq").cast("double"))
        ).alias("tfidf")
    keyed = joined.select("id", "term", "tf", "dfreq", key)
    kname = "tfidf_fp" if idf_mode == "rational" else "tfidf"
    w = Window.partitionBy("id").orderBy(F.col(kname).desc(), F.col("term"))
    return (
        keyed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select(F.col("id").alias(id_col), "term", "tf", "dfreq", kname, "rank")
    )
