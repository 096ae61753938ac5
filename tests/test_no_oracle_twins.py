"""Uniform equivalence gates for the 5 permanent no-oracle suite rows
(VERDICT r7 item 4).

Five registered queries have no DuckDB twin by design (xxhash64 /
HLL-sketch internals DuckDB cannot replay). Each one here is tested
against its ORACLE-GATED companion at the DECISION level — the output
a user acts on — using the REGISTERED suite case functions themselves,
so the gate covers exactly what the driver runs rows-only:

| no-oracle row           | twin (oracle-gated)          | decision gate |
|-------------------------|------------------------------|---------------|
| q_dedup_minhash         | q_dedup_ngram_jaccard        | verified pairs == exact truth |
| q_dedup_simhash         | q_dedup_simhash_md5          | exact-dup pairs flagged by both |
| q_sim_knn_lsh           | q_sim_knn (+_lsh_recall)     | recall@5 >= 0.5, bit-equal cosines |
| q_sim_knn_ivf           | q_sim_knn (+_ivf_recall)     | recall@5 >= 0.4, bit-equal cosines |
| q_agg_approx_distinct   | q_agg_approx_distinct_bound  | HLL within 3x rsd of exact |

COVERAGE.md names each test next to its row.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_pipeline_framework_spark.io.readers import table
from pyspark_pipeline_framework_spark.suite import all_cases


@pytest.fixture(scope="module")
def cases():
    return all_cases()


def _docs(spark, sf_dir):
    return table(spark, sf_dir, "documents")


def test_twin_q_dedup_minhash(spark, sf_dir, cases):
    """xxhash64 LSH candidates -> exact-Jaccard verify must equal the
    oracle-gated exact truth (q_dedup_ngram_jaccard's pair set, itself
    hash-gated vs DuckDB) — the same decision equality the md5 chain
    (q_dedup_minhash_md5 -> q_dedup_minhash_verify) is oracle-gated
    for. At 16 bands x 4 rows, P[miss | J=0.8] ~ 8e-5: equality, not
    recall, is the contract."""
    from pyspark_pipeline_framework_spark.llm.dedup import jaccard_verify

    cand = cases["q_dedup_minhash"].spark_fn(spark, sf_dir)
    verified = jaccard_verify(
        _docs(spark, sf_dir), cand, shingle_k=3, threshold=0.8
    )
    got = {(r.id_a, r.id_b) for r in verified.collect()}
    truth = {
        (r.id_a, r.id_b)
        for r in cases["q_dedup_ngram_jaccard"].spark_fn(spark, sf_dir).collect()
    }
    assert truth, "testdata should contain planted near-dups"
    assert got == truth


def test_twin_q_dedup_simhash(spark, sf_dir, cases):
    """The xxhash64 and md5 simhash spaces differ, so their borderline
    pair sets legitimately differ; the decision both MUST agree on is
    exact duplicates: identical text -> identical signature -> every
    block collides -> the pair is emitted with hamming 0 in EITHER
    space. The test corpus has no verbatim duplicates, so plant some:
    copy 5 documents under shifted ids and run both variants' pipeline
    (simhash -> 16-bit-block LSH -> hamming<=6) over the union. The
    md5 side of the pipeline is oracle-gated by q_dedup_simhash_md5."""
    from pyspark_pipeline_framework_spark.llm.dedup import simhash
    from pyspark_pipeline_framework_spark.suite.llm import _simhash_block_pairs

    d = _docs(spark, sf_dir).select("doc_id", "text")
    base = d.orderBy("doc_id").limit(5)
    copies = base.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    dup_pairs = {(r.doc_id, r.doc_id + 1_000_000) for r in base.collect()}
    corpus = d.unionByName(copies)
    for hash_fn in ("xxhash64", "md5"):
        out = _simhash_block_pairs(simhash(corpus, hash_fn=hash_fn))
        got = {(r.id_a, r.id_b): r.hamming for r in out.collect()}
        missing = dup_pairs - set(got)
        assert not missing, f"{hash_fn} missed exact-dup pairs {missing}"
        assert all(got[p] == 0 for p in dup_pairs), hash_fn


def _knn_twin(spark, sf_dir, cases, approx_name, recall_floor):
    exact = cases["q_sim_knn"].spark_fn(spark, sf_dir)
    approx = cases[approx_name].spark_fn(spark, sf_dir)
    e = {(r.query_id, r.vec_id): r.cos_sim for r in exact.collect()}
    a = {(r.query_id, r.vec_id): r.cos_sim for r in approx.collect()}
    assert len(set(a) & set(e)) / len(e) >= recall_floor
    # every common hit must carry the identical fixed-point cosine the
    # oracle-gated exact case publishes — bit-equal, not approx-equal
    for k in set(a) & set(e):
        assert a[k] == e[k], k


def test_twin_q_sim_knn_lsh(spark, sf_dir, cases):
    """Random-hyperplane LSH vs the oracle-gated exact brute force:
    recall@5 >= 0.5 (the same floor q_sim_knn_lsh_recall gates in the
    driver run) and bit-equal scores on common hits."""
    _knn_twin(spark, sf_dir, cases, "q_sim_knn_lsh", 0.5)


def test_twin_q_sim_knn_ivf(spark, sf_dir, cases):
    """Fast-mode IVF vs the oracle-gated exact brute force: recall@5
    >= 0.4 (the q_sim_knn_ivf_recall floor) and bit-equal scores."""
    _knn_twin(spark, sf_dir, cases, "q_sim_knn_ivf", 0.4)


def test_twin_q_agg_approx_distinct(spark, sf_dir, cases):
    """HLL estimates vs the oracle-gated exact counts
    (q_agg_approx_distinct_bound): within 3x the default rsd (15%)
    per group, same group set."""
    est = {
        r.l_returnflag: r.approx_parts
        for r in cases["q_agg_approx_distinct"].spark_fn(spark, sf_dir).collect()
    }
    exact = {
        r.l_returnflag: r.exact_parts
        for r in cases["q_agg_approx_distinct_bound"].spark_fn(spark, sf_dir).collect()
    }
    assert set(est) == set(exact)
    for g, x in exact.items():
        assert abs(est[g] - x) <= 0.15 * x, (g, est[g], x)
