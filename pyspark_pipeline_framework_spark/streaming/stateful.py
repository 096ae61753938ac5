"""Custom stateful streaming operators.

Beyond the reference's source→transform→sink wiring (its ``transform``
is stateless — SURVEY.md §2.6 'not implemented'), these add the two
standard stateful patterns:

* :func:`streaming_dedup` — exactly-once-per-key emission with bounded
  state: ``dropDuplicatesWithinWatermark`` keeps a key's state only
  until the watermark passes it (at 100 TB: state size is bounded by
  keys-per-watermark-window, not stream history).
* :func:`running_counts` / :func:`sessionize` —
  ``applyInPandasWithState`` operators: per-key state carried across
  micro-batches with timeout-driven eviction (Arrow-batched; state is
  a tuple, not a DataFrame — executors hold it in the state store).
* :func:`incremental_neardup_batch` — streaming NEAR-dup (MinHash-LSH)
  whose state is the parquet band store, not the state store: corpus
  history is unbounded at zero executor memory, micro-batch replays
  are idempotent via per-batch-id overwrite partitions.
* :func:`streaming_ivf_add_batch` — streaming ANN-index growth under a
  frozen IVF quantizer: same parquet-is-the-state / per-batch-id
  idempotence recipe, map-only per batch.

Both run identically under availableNow (tests) and continuous
micro-batch triggers (production).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


class StoreLayoutError(ValueError):
    """The incremental store on disk and the stream writer disagree on
    the sub-partition layout (r9 ADVICE): a store compacted with
    ``partition_by=[...]`` is nested ``batch_id=-1/<key>=.../`` — a
    writer appending FLAT ``batch_id=N`` dirs (keys as data columns)
    next to it makes ``spark.read.parquet(store)`` fail with Spark's
    'conflicting directory structures'. Pass the SAME ``partition_by``
    to the stream writer as was passed to ``compact_batch_store`` (or
    keep a partition_by-compacted store search-only)."""


def _store_sub_layout(spark, store_path: str) -> list[str] | None:
    """Partition keys nested BENEATH the ``batch_id=N`` level of an
    existing store, in path order — ``[]`` for a flat store, ``None``
    when the store doesn't exist yet. Derived from the file paths Spark
    itself resolved (works on any Hadoop-visible FS and on Connect —
    no SparkContext / JVM access)."""
    try:
        files = spark.read.parquet(store_path).inputFiles()
    except Exception as ex:
        if "onflicting directory structures" in str(ex):
            raise StoreLayoutError(
                f"store {store_path!r} already MIXES flat and nested "
                "batch partitions (Spark: conflicting directory "
                "structures) — an earlier writer appended with the "
                "wrong partition_by. Re-compact the store with "
                "compact_batch_store to a single layout before "
                "resuming the stream."
            ) from ex
        return None  # fresh store (or transient): nothing to mirror yet
    for f in files:
        parts = f.split("/")
        try:
            i = next(j for j, seg in enumerate(parts) if seg.startswith("batch_id="))
        except StopIteration:
            continue
        return [seg.split("=", 1)[0] for seg in parts[i + 1:-1] if "=" in seg]
    return None


def _check_store_layout(spark, store_path: str,
                        partition_by: list[str] | None) -> None:
    existing = _store_sub_layout(spark, store_path)
    want = list(partition_by or [])
    if existing is not None and existing != want:
        raise StoreLayoutError(
            f"store {store_path!r} is laid out batch_id=N/"
            f"{'/'.join(k + '=*' for k in existing) or '<flat>'} but this "
            f"stream writer would append batch_id=N/"
            f"{'/'.join(k + '=*' for k in want) or '<flat>'} — mixed "
            "layouts make spark.read.parquet(store) fail with "
            "'conflicting directory structures'. Pass partition_by="
            f"{existing!r} to match the store (a compacted store mirrors "
            "compact_batch_store's partition_by)."
        )


def streaming_dedup(
    df: DataFrame,
    keys: list[str],
    watermark_col: str,
    watermark_delay: str,
) -> DataFrame:
    """Streaming dedup with bounded state: first row per key wins,
    duplicate suppression state expires with the watermark."""
    return df.withWatermark(watermark_col, watermark_delay).dropDuplicatesWithinWatermark(keys)


RUNNING_COUNT_SCHEMA = "key string, n bigint, total double"
_RUNNING_STATE_SCHEMA = "n bigint, total double"


def _running_count_fn(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"key": [key[0]], "n": [n], "total": [total]})


def running_counts(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Per-key running count + sum carried across micro-batches —
    the minimal ``applyInPandasWithState`` operator shape."""
    keyed = df.selectExpr(f"{key_col} AS key", f"{value_col} AS value")
    return keyed.groupBy("key").applyInPandasWithState(
        _running_count_fn,
        outputStructType=RUNNING_COUNT_SCHEMA,
        stateStructType=_RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_counts_tws(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Per-key running count + sum on the MODERN state API
    (``transformWithStateInPandas``, Spark 4): typed ``ValueState``
    via a ``StatefulProcessorHandle`` instead of the legacy
    ``applyInPandasWithState`` tuple state. Functionally identical to
    :func:`running_counts` (the test asserts it), plus what the new API
    buys at scale: composable named state variables, per-state TTL, and
    timers — the surface long-running 100 TB ingestion state machines
    need. Requires the RocksDB state store provider (set by the test /
    caller via ``spark.sql.streaming.stateStore.providerClass``) AND
    the ``protobuf`` package (the state-server protocol dependency —
    fails loudly here if absent, same gating policy as the connector
    formats)."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "transformWithStateInPandas needs the 'protobuf' package "
            "(pyspark's state-server protocol); install protobuf or use "
            "running_counts (applyInPandasWithState) instead"
        ) from e
    import pandas as pd  # noqa: F811 (executor-side closure import)
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class Processor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", "n BIGINT, total DOUBLE")

        def handleInputRows(self, key, rows, timer_values):
            n, total = self._agg.get() if self._agg.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._agg.update((n, float(total)))
            yield pd.DataFrame({"key": [key[0]], "n": [n], "total": [total]})

        def close(self) -> None:
            pass

    keyed = df.selectExpr(f"{key_col} AS key", f"{value_col} AS value")
    return keyed.groupBy("key").transformWithStateInPandas(
        statefulProcessor=Processor(),
        outputStructType=RUNNING_COUNT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


SESSION_SCHEMA = "key string, n_events bigint, session_open boolean"
_SESSION_STATE_SCHEMA = "n bigint"


def _session_fn(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        (n,) = state.get
        state.remove()
        yield pd.DataFrame({"key": [key[0]], "n_events": [n], "session_open": [False]})
        return
    n = state.get[0] if state.exists else 0
    for pdf in batches:
        n += len(pdf)
    state.update((n,))
    state.setTimeoutDuration(30_000)  # close the session after 30s idle
    yield pd.DataFrame({"key": [key[0]], "n_events": [n], "session_open": [True]})


def sessionize(df: DataFrame, key_col: str) -> DataFrame:
    """Timeout-driven sessionization: emits running session progress per
    key and a final closed-session row when the key goes idle —
    processing-time timeout variant (event-time windows are covered by
    ``operators.windows.event_session_window``)."""
    keyed = df.selectExpr(f"{key_col} AS key")
    return keyed.groupBy("key").applyInPandasWithState(
        _session_fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def incremental_neardup_batch(
    store_path: str,
    pairs_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    hash_fn: str = "xxhash64",
    partition_by: list[str] | None = None,
):
    """``foreachBatch`` factory: streaming NEAR-dup detection — the
    stateful big sibling of :func:`streaming_dedup` (which is
    exact-key). Each micro-batch is MinHash-banded
    (:func:`~pyspark_pipeline_framework_spark.llm.dedup.minhash_bands`),
    joined against the parquet band store accumulated from all previous
    batches (:func:`~pyspark_pipeline_framework_spark.llm.dedup.incremental_candidate_pairs`
    — new×new plus new×history, never history×history), and appended to
    the store. State lives in the store parquet, not the executors:
    unbounded corpus history costs zero state-store memory, and a
    1000-executor job shuffles only (id, band_idx, band_hash) longs.

    Retry-idempotent by construction: each batch writes
    ``<path>/batch_id=N`` with ``overwrite`` — a replayed micro-batch
    (foreachBatch's at-least-once contract) overwrites its own
    partition instead of double-appending, and the corpus read filters
    ``batch_id < N`` so a half-written previous attempt of the SAME
    batch never joins as history.

    ``partition_by`` mirrors a compacted store's sub-partition layout
    (r9 ADVICE): when the live store was rewritten by
    ``compact_batch_store(..., partition_by=[...])`` its history is
    nested ``batch_id=-1/<key>=.../`` — new batches must nest the same
    way (``partitionBy(*partition_by)`` INSIDE ``batch_id=N``) or every
    subsequent read of the store fails with Spark's 'conflicting
    directory structures'. The first micro-batch probes the existing
    store layout and raises :class:`StoreLayoutError` on a mismatch —
    before writing anything.

    Returns ``process(batch_df, batch_id)`` for
    ``writeStream.foreachBatch`` (or ``ForeachBatchSink``).
    """
    from pyspark.sql import functions as F

    from pyspark_pipeline_framework_spark.llm.dedup import (
        incremental_candidate_pairs,
        minhash_bands,
    )

    layout_checked: list = []

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if not layout_checked:
            _check_store_layout(spark, store_path, partition_by)
            layout_checked.append(True)
        bands_df = minhash_bands(
            batch_df, id_col, text_col, num_hashes, bands, shingle_k, hash_fn
        )
        # write the batch's bands FIRST, then read them back for the
        # pair join: the signature pipeline runs exactly once, nothing
        # is pinned in executor storage between micro-batches (an
        # eager localCheckpoint here would accumulate blocks for the
        # life of a continuous stream), and a mid-batch failure is
        # still safe — the retry overwrites the same partition before
        # recomputing pairs
        new_dir = f"{store_path}/batch_id={batch_id}"
        # REBALANCE (AQE works inside foreachBatch — verified r12): the
        # banding pipeline ends in a cores-wide shuffle, so an unhinted
        # write emits one tiny file per shuffle partition per
        # micro-batch; byte-sized rebalancing keeps the store's file
        # count proportional to DATA, not batches×cores (guide §6)
        balanced = (
            bands_df.hint("rebalance", *partition_by)
            if partition_by
            else bands_df.hint("rebalance")
        )
        w = balanced.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(new_dir)
        store = spark.read.parquet(store_path)
        new = store.where(F.col("batch_id") == F.lit(batch_id)).drop("batch_id")
        # batch_id < N (not just != N): a half-written FUTURE partition
        # cannot exist, but a replayed batch must not see its own prior
        # attempt as history. Missing-store is impossible here (this
        # batch just wrote its partition), so no exception swallowing —
        # any read failure is a real failure and must fail the batch
        # rather than silently dropping corpus history.
        corpus = store.where(F.col("batch_id") < F.lit(batch_id)).drop("batch_id")
        pairs = incremental_candidate_pairs(new, corpus)
        pairs.hint("rebalance").write.mode("overwrite").parquet(
            f"{pairs_path}/batch_id={batch_id}"
        )

    return process


def incremental_spans_batch(
    store_path: str,
    counts_path: str,
    spans_path: str,
    min_tokens: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "xxhash64",
    partition_by: list[str] | None = None,
):
    """``foreachBatch`` factory: streaming exact-substring (span)
    dedup — the ExactSubstr sibling of :func:`incremental_neardup_batch`.
    Each document micro-batch is grammed
    (:func:`~pyspark_pipeline_framework_spark.llm.dedup.substring_gram_stream`),
    its gram positions and mergeable partial counts land as
    ``batch_id=N`` partitions of the two stores, and
    :func:`~pyspark_pipeline_framework_spark.llm.dedup.incremental_duplicated_spans`
    recomputes spans for exactly the documents this batch touched (the
    new docs plus old docs whose grams crossed 1 → >=2) against the
    ``batch_id < N`` history — never a corpus re-hash. The per-batch
    span UPDATES land at ``<spans_path>/batch_id=N``; the
    corpus-current span table is the latest update per document
    (:func:`~pyspark_pipeline_framework_spark.llm.dedup.current_span_table`),
    and equals a from-scratch ``duplicated_spans`` over everything
    ingested so far.

    Same durability contract as the MinHash variant: state lives in
    store parquet (zero executor state-store memory); a replayed
    micro-batch overwrites its own ``batch_id`` partitions and filters
    its history with ``batch_id < N``, so at-least-once replays are
    idempotent; the first micro-batch probes the gram store's on-disk
    layout and raises :class:`StoreLayoutError` before writing a
    partition that would conflict with a ``partition_by``-compacted
    store (compact with
    :func:`~pyspark_pipeline_framework_spark.io.compaction.compact_batch_store`;
    union-compaction keeps the partial-count store correct because
    partials are summable — see ``substring_count_partials``).

    Returns ``process(batch_df, batch_id)`` for
    ``writeStream.foreachBatch`` (or ``ForeachBatchSink``)."""
    from pyspark.sql import functions as F

    from pyspark_pipeline_framework_spark.llm.dedup import (
        incremental_duplicated_spans,
        substring_count_partials,
        substring_gram_stream,
    )

    layout_checked: list = []

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if not layout_checked:
            _check_store_layout(spark, store_path, partition_by)
            layout_checked.append(True)
        grams = substring_gram_stream(
            batch_df, min_tokens, id_col, text_col, hash_fn
        )
        # grams land FIRST, then counts and spans derive from the
        # READ-BACK partition: the tokenize/explode pipeline runs once,
        # nothing is pinned in executor storage between micro-batches,
        # and a mid-batch retry overwrites the same partitions before
        # recomputing anything downstream
        # REBALANCE all three store writes (same §6 file-sizing rationale
        # as the MinHash writer above; AQE works inside foreachBatch)
        balanced = (
            grams.hint("rebalance", *partition_by)
            if partition_by
            else grams.hint("rebalance")
        )
        w = balanced.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(f"{store_path}/batch_id={batch_id}")
        store = spark.read.parquet(store_path)
        new = store.where(F.col("batch_id") == F.lit(batch_id)).drop("batch_id")
        substring_count_partials(new).hint("rebalance").write.mode(
            "overwrite"
        ).parquet(f"{counts_path}/batch_id={batch_id}")
        # batch_id < N (not != N): a replayed batch must not see its
        # own prior attempt as history (same rationale as the MinHash
        # store above)
        corpus = store.where(F.col("batch_id") < F.lit(batch_id)).drop("batch_id")
        hist_counts = (
            spark.read.parquet(counts_path)
            .where(F.col("batch_id") < F.lit(batch_id))
            .drop("batch_id")
        )
        upd = incremental_duplicated_spans(
            new, corpus, hist_counts, min_tokens=min_tokens, id_col=id_col
        )
        upd.hint("rebalance").write.mode("overwrite").parquet(
            f"{spans_path}/batch_id={batch_id}"
        )

    return process


def streaming_ivf_add_batch(
    store_path: str,
    centroids,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "fast",
    partition_by: list[str] | None = None,
):
    """``foreachBatch`` factory: streaming ANN-index growth — the
    incremental half of the IVF train-once/add-forever contract
    (:func:`~pyspark_pipeline_framework_spark.llm.similarity.ivf_index`
    / :func:`~pyspark_pipeline_framework_spark.llm.similarity.ivf_add`)
    as a stream operator. Each embedding micro-batch is cell-assigned
    under the FROZEN quantizer (``ivf_add``: map-only, no shuffle, no
    retraining, the existing store untouched) and lands as
    ``<store_path>/batch_id=N``.

    Like :func:`incremental_neardup_batch`, state lives in the store
    parquet, not the executors: an unbounded corpus history costs zero
    state-store memory, and replay is idempotent — foreachBatch's
    at-least-once contract becomes exactly-once on the store because a
    replayed micro-batch overwrites its own ``batch_id`` partition.

    ``centroids`` is a parquet path, the nlist-row centroid DataFrame,
    or the raw matrix; it is resolved ONCE on the first micro-batch and
    memoized in the closure (the collect is bounded by nlist — a model
    hyperparameter — and paid once per stream, not once per batch).
    Search any union of batches at any time with ``ivf_search`` over
    ``spark.read.parquet(store_path)`` — the ``cell`` column survives
    for pruning; pass ``partition_by=["cell"]`` to nest each batch as
    ``batch_id=N/cell=K`` for STATIC cell pruning on top of batch
    lineage. ``partition_by=["cell"]`` is REQUIRED when resuming into a
    store compacted with ``compact_batch_store(...,
    partition_by=["cell"])`` (r9 ADVICE): mixed flat/nested batch dirs
    make every read of the store fail with 'conflicting directory
    structures'. The first micro-batch probes the existing layout and
    raises :class:`StoreLayoutError` on a mismatch — before writing.
    """
    from pyspark_pipeline_framework_spark.llm.similarity import (
        _as_centroid_matrix,
        ivf_add,
    )

    memo: list = []

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if not memo:
            _check_store_layout(batch_df.sparkSession, store_path, partition_by)
            c = centroids
            if isinstance(c, str):
                c = batch_df.sparkSession.read.parquet(c)
            memo.append(_as_centroid_matrix(c))
        assigned = ivf_add(
            batch_df, memo[0], dim, id_col=id_col, vec_col=vec_col, mode=mode
        )
        w = assigned.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(f"{store_path}/batch_id={batch_id}")

    return process


def streaming_ivfpq_add_batch(
    store_path: str,
    centroids,
    codebooks,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    partition_by: list[str] | None = None,
):
    """``foreachBatch`` factory: streaming IVFPQ-index growth — the
    compressed sibling of :func:`streaming_ivf_add_batch`. Each
    embedding micro-batch is cell-assigned AND PQ-encoded in one
    map-only pass under the FROZEN quantizer pair
    (:func:`~pyspark_pipeline_framework_spark.llm.pq.ivfpq_add`), so
    the growing store holds ``(id, cell, codes)`` — a few bytes per
    vector, no raw floats — and lands as ``<store_path>/batch_id=N``.

    Same durability contract as the IVF variant: state lives in the
    store parquet (zero executor state), replay is idempotent (a
    replayed micro-batch overwrites its own ``batch_id`` partition),
    both models are resolved ONCE on the first micro-batch (each
    collect bounded by a model hyperparameter), and the first batch
    probes the on-disk layout, raising :class:`StoreLayoutError`
    before writing a partition that would conflict with a
    ``partition_by``-compacted store. Search any union of batches with
    :func:`~pyspark_pipeline_framework_spark.llm.pq.ivfpq_search` over
    ``spark.read.parquet(store_path)``; pass ``partition_by=["cell"]``
    to enable static cell pruning on top of batch lineage."""
    from pyspark_pipeline_framework_spark.llm.pq import (
        _as_codebook_matrix,
        ivfpq_add,
    )
    from pyspark_pipeline_framework_spark.llm.similarity import _as_centroid_matrix

    memo: list = []

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if not memo:
            _check_store_layout(batch_df.sparkSession, store_path, partition_by)
            c, b = centroids, codebooks
            if isinstance(c, str):
                c = batch_df.sparkSession.read.parquet(c)
            if isinstance(b, str):
                b = batch_df.sparkSession.read.parquet(b)
            memo.append((_as_centroid_matrix(c), _as_codebook_matrix(b)))
        C, B = memo[0]
        store_rows = ivfpq_add(batch_df, C, B, dim, id_col=id_col, vec_col=vec_col)
        w = store_rows.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(f"{store_path}/batch_id={batch_id}")

    return process
