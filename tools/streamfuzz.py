"""Stateful-streaming differential fuzzing: random fuzz specs replayed
through Structured Streaming STATEFUL paths and asserted equal to their
batch plans.

Five families (1-2: VERDICT r5 item 7; 3-4: VERDICT r6 item 5 — route
specs through stream_stream_join and session-window aggregation;
5: VERDICT r7 item 6 — randomized custom stateful processors):

1. **dropDuplicatesWithinWatermark**: qualifying distinct-terminal
   specs over `events` (derive/filter stages, no joins) run as
   ``readStream → stages → withWatermark → dropDuplicatesWithinWatermark
   (keys) → select(keys)`` across MULTIPLE micro-batches
   (maxFilesPerTrigger=1 over a 4-file copy) and must produce exactly
   the batch ``select(keys).distinct()`` key set. The watermark is far
   larger than the data span, so no row is late-dropped — streaming
   dedup state must therefore carry keys ACROSS micro-batches.

2. **update-mode aggregation**: qualifying grouped-agg specs run with
   ``outputMode("update")`` + ``foreachBatch``; each micro-batch emits
   only the UPDATED groups, which the driver upserts into a dict —
   the final upserted state must equal the batch aggregation exactly.
   This exercises incremental state merge (sum/count/min/max partials
   across batches), which complete-mode cannot distinguish from a
   single-batch recompute.

3. **stream-stream join** (`streaming/joins.py`): spec stages transform
   the LEFT side of a watermarked, time-bounded inner
   ``stream_stream_join`` against a second stream of the same events
   copy; with a watermark far beyond the data span no state is evicted,
   so the streamed pair set must equal the SAME operator run over the
   batch frames (the time bound `within` is randomized per spec and
   shapes the expected result on both sides identically). Exercises
   two-sided join state carried across micro-batches.

4. **session-window aggregation**: qualifying grouped-agg specs run as
   ``withWatermark → groupBy(session_window(ts, gap), keys)`` in append
   mode, gap randomized per spec. The multi-file copy is written as
   TIME-ORDERED quartiles (no late data by construction) plus one
   far-future sentinel file whose only job is to push the final
   watermark past every real session's end so append mode emits them;
   the sentinel's own (never-finalized) session is excluded on the
   batch side by a timestamp filter. Batch twin: the identical
   ``session_window`` aggregation over the same files. Exercises
   session merge/finalization state across micro-batches.

Determinism: both sides read the SAME materialized multi-file parquet
copy (written once per table via io.readers.table, which normalizes
the events nanos timestamps), and every compared value is a key set or
an exact aggregate (sum_dbl goes through DECIMAL(38,6) state, so even
float sums are order-independent; count_distinct specs are excluded —
unsupported in streaming aggregation).

5. **randomized stateful processors**: random specs (key cardinality
   1-8, 2-5 micro-batch files, random row volumes, and a deterministic
   count-threshold RESET rule exercising the state remove/recreate
   lifecycle) run the same per-key state machine — count/sum/min/max
   fold, emit, conditional state removal — through BOTH state APIs:
   the legacy ``applyInPandasWithState`` (tuple state) and the Spark-4
   ``transformWithStateInPandas`` (typed ValueState + RocksDB
   provider, vendored-protobuf bootstrap shared with
   tests/conftest.py). A passthrough recorder captures the EXACT
   micro-batch composition first, and a driver-side python replay of
   those batches is the oracle — all three must agree on every key's
   final state. Values are integer-valued doubles, so every fold is
   exact and chunk order cannot drift results. Wall-clock timeouts are
   excluded for determinism (fixed-input coverage in
   tests/test_streaming_stateful.py); the reset rule covers the same
   state-lifecycle surface deterministically.

6. **streaming IVF index growth**: random quantizer size (nlist),
   assignment mode (fast/exact), batch count, corpus subset, and
   batch-split salt per spec, with ONE batch replayed mid-stream
   (foreachBatch's at-least-once contract): driving
   ``streaming_ivf_add_batch`` batch-by-batch must leave exactly the
   batch ``ivf_add`` store under the same frozen quantizer, and (on a
   sampled third of specs) ``ivf_search`` over the streamed store must
   equal search over the batch store. Exercises the
   parquet-is-the-state recipe under random growth histories.
   (Family 7 is the IVFPQ sibling over the compressed code store.)

8. **streaming incremental exact-substring dedup** (r12): random
   min_tokens / hash_fn / batch count / corpus subset / batch-split
   salt, ONE batch replayed mid-stream, and (on a sampled third) a
   MID-STREAM maintenance cycle compacting all three stores —
   gram/count via compact_batch_store, the span update store via
   compact_span_store's latest-wins fold. The corpus-current span
   table after the final batch must equal a from-scratch
   ``duplicated_spans`` over everything ingested.

Usage: python tools/streamfuzz.py [--n-dedup 12] [--n-agg 12]
                                  [--n-join 10] [--n-session 10]
                                  [--n-stateful 10] [--n-ivf 8]
                                  [--n-ivfpq 6] [--n-spans 6]
                                  [--seed 2026] [--sf DIR]
Exit 0 iff zero mismatches.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

TOOLS = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(TOOLS)
sys.path.insert(0, REPO)
sys.path.insert(0, TOOLS)

import duckdb  # noqa: E402

import fuzzcheck  # noqa: E402
from fuzzcheck import apply_stages, spec_for, to_spark  # noqa: E402


def _qualifying_specs(stats: dict, seed: int, n_dedup: int, n_agg: int,
                      n_join: int, n_session: int):
    """Scan the seeded spec stream for the four qualifying families."""
    dedup, agg, join, session = [], [], [], []
    i = 0
    while (len(dedup) < n_dedup or len(agg) < n_agg
           or len(join) < n_join or len(session) < n_session) and i < 6000:
        spec = spec_for(seed, i, stats)
        i += 1
        if spec.get("kind"):
            continue
        t = spec["terminal"]
        has_join = any(s["op"] == "join" for s in spec["stages"])
        if (len(dedup) < n_dedup and t["op"] == "distinct"
                and spec["base"] == "events" and not has_join):
            dedup.append(spec)
        elif (len(agg) < n_agg and t["op"] == "agg"
                and t.get("grouping") == "plain" and t["keys"]
                and not t.get("having") and not has_join
                and all(a["fn"] != "count_distinct" for a in t["aggs"])):
            agg.append(spec)
        elif (len(session) < n_session and t["op"] == "agg"
                and spec["base"] == "events"
                and t.get("grouping") == "plain" and t["keys"]
                and "ts" not in t["keys"]
                and not t.get("having") and not has_join
                and all(a["fn"] != "count_distinct" for a in t["aggs"])):
            session.append(spec)
        elif (len(join) < n_join and spec["base"] == "events"
                and not has_join):
            # only the STAGES matter for the join family (the terminal
            # is replaced by the stream-stream join itself)
            join.append(spec)
    return dedup, agg, join, session


def _await(q, timeout_s: int = 180) -> None:
    q.awaitTermination(timeout_s)
    if q.isActive:
        q.stop()
        raise TimeoutError("streaming query did not finish in time")


def _ensure_protobuf() -> None:
    """Same vendored-protobuf bootstrap as tests/conftest.py (see its
    docstring): transformWithStateInPandas needs google.protobuf in the
    driver AND workers; when only the gcloud-sdk vendored copy exists,
    prepend it plus the tests/_pbvendor version-gate shim BEFORE the
    session is built. No-op when protobuf is installed or absent."""
    try:
        import google.protobuf  # noqa: F401

        return
    except ImportError:
        pass
    cand = "/usr/lib/google-cloud-sdk/platform/google_appengine"
    if os.path.isfile(os.path.join(cand, "google", "protobuf", "__init__.py")):
        shim = os.path.join(REPO, "tests", "_pbvendor")
        for p in (shim, cand):
            if p not in sys.path:
                sys.path.insert(0, p)
        os.environ["PYTHONPATH"] = os.pathsep.join(
            [shim, cand]
            + [q for q in os.environ.get("PYTHONPATH", "").split(os.pathsep) if q]
        )
        import sitecustomize  # noqa: F401


def _tws_available() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


#: streaming-supported aggregate renderings (count_distinct excluded —
#: unsupported in streaming aggregation; sum_dbl is DECIMAL(38,6)
#: state, so cross-batch merge order cannot drift the float result)
def _agg_expr(a):
    from pyspark.sql import functions as F

    c, fn = a["col"], a["fn"]
    e = {
        "count_star": lambda c: F.count(F.lit(1)),
        "count": F.count,
        "min": F.min,
        "max": F.max,
        "sum_int": lambda c: F.sum(c).cast("bigint"),
        "sum_dbl": lambda c: F.sum(F.col(c).cast("decimal(38,6)")).cast("double"),
    }[fn](c)
    return e.alias(a["alias"])


#: family-5 state machine: (n, total, vmin, vmax) per key, fold a
#: micro-batch, then EMIT; if a reset threshold is hit, the state is
#: REMOVED (next occurrence starts fresh). Values are integer-valued
#: doubles, so every fold is exact float64 arithmetic — chunk order
#: inside a batch cannot drift the result.
_F5_OUT_SCHEMA = ("key string, n bigint, total double, vmin double, "
                  "vmax double, was_reset boolean")
_F5_STATE_SCHEMA = "n bigint, total double, vmin double, vmax double"


def _f5_fold(n, t, mn, mx, pdf):
    n += len(pdf)
    t += float(pdf["value"].sum())
    mn = min(mn, float(pdf["value"].min()))
    mx = max(mx, float(pdf["value"].max()))
    return n, t, mn, mx


def _f5_make_legacy_fn(reset_at):
    """applyInPandasWithState implementation of the family-5 machine."""

    def fn(key, batches, state):
        import pandas as pd

        n, t, mn, mx = (
            state.get if state.exists else (0, 0.0, float("inf"), float("-inf"))
        )
        seen = 0
        for pdf in batches:
            if not len(pdf):
                continue
            seen += len(pdf)
            n, t, mn, mx = _f5_fold(n, t, mn, mx, pdf)
        if not seen:
            return
        if reset_at is not None and n >= reset_at:
            state.remove()
            reset = True
        else:
            state.update((n, float(t), float(mn), float(mx)))
            reset = False
        yield pd.DataFrame({"key": [key[0]], "n": [n], "total": [t],
                            "vmin": [mn], "vmax": [mx], "was_reset": [reset]})

    return fn


def _f5_make_tws(reset_at):
    """transformWithStateInPandas (Spark-4 typed state) implementation
    of the SAME machine — ValueState + clear() for the reset."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class Processor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", _F5_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timer_values):
            n, t, mn, mx = (
                self._agg.get() if self._agg.exists()
                else (0, 0.0, float("inf"), float("-inf"))
            )
            seen = 0
            for pdf in rows:
                if not len(pdf):
                    continue
                seen += len(pdf)
                n, t, mn, mx = _f5_fold(n, t, mn, mx, pdf)
            if not seen:
                return
            if reset_at is not None and n >= reset_at:
                self._agg.clear()
                reset = True
            else:
                self._agg.update((n, float(t), float(mn), float(mx)))
                reset = False
            yield pd.DataFrame({"key": [key[0]], "n": [n], "total": [t],
                                "vmin": [mn], "vmax": [mx],
                                "was_reset": [reset]})

        def close(self) -> None:
            pass

    return Processor()


def _f5_replay(file_batches, reset_at):
    """Driver-side python oracle: fold the RECORDED micro-batches
    through the same machine; returns key -> last emission."""
    state: dict = {}
    last: dict = {}
    for rows in file_batches:
        per: dict = {}
        for _rid, k, v in rows:
            n, t, mn, mx = per.get(k, (0, 0.0, float("inf"), float("-inf")))
            per[k] = (n + 1, t + v, min(mn, v), max(mx, v))
        for k, (dn, dt, dmn, dmx) in per.items():
            n, t, mn, mx = state.get(k, (0, 0.0, float("inf"), float("-inf")))
            n, t, mn, mx = n + dn, t + dt, min(mn, dmn), max(mx, dmx)
            if reset_at is not None and n >= reset_at:
                last[k] = (n, t, mn, mx, True)
                state.pop(k, None)
            else:
                last[k] = (n, t, mn, mx, False)
                state[k] = (n, t, mn, mx)
    return last


def _spans_family(spark, tmp: str, seed: int, n_spans: int, sf_dir: str) -> int:
    """Family 8 (r12): randomized streaming exact-substring span-dedup
    growth. Random min_tokens / hash_fn / batch count / corpus subset /
    batch-split salt per spec; one batch replayed mid-stream
    (foreachBatch's at-least-once contract); on a sampled third a
    MID-STREAM maintenance cycle compacts all three stores (gram/count
    via compact_batch_store — union keeps summable partials correct —
    and the span update store via compact_span_store's latest-wins
    fold) and the stream continues onto the baselines. After the final
    batch the corpus-current span table (latest update per doc) must
    equal a from-scratch duplicated_spans over everything ingested —
    the incremental path's defining property under arbitrary growth
    histories."""
    import random as _random
    import shutil as _shutil

    from pyspark.sql import functions as F

    from pyspark_pipeline_framework_spark.io.compaction import (
        compact_batch_store,
        compact_span_store,
    )
    from pyspark_pipeline_framework_spark.llm.dedup import (
        current_span_table,
        duplicated_spans,
    )
    from pyspark_pipeline_framework_spark.streaming.stateful import (
        incremental_spans_batch,
    )

    rng = _random.Random(seed * 7919 + 88)
    docs_full = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    failures = 0
    for i in range(n_spans):
        L = rng.choice([4, 6, 8, 12])
        hf = rng.choice(["md5", "xxhash64"])
        nb = rng.randint(2, 4)
        m = rng.randint(1, 3)          # corpus subset (m=1 → full table)
        salt = rng.randint(0, 10**6)   # batch-split salt
        t0 = time.time()
        sub = docs_full.where(F.col("doc_id") % m == 0)
        store = os.path.join(tmp, f"spans8_{i}_g")
        counts = os.path.join(tmp, f"spans8_{i}_c")
        spans = os.path.join(tmp, f"spans8_{i}_s")
        proc = incremental_spans_batch(
            store, counts, spans, min_tokens=L, hash_fn=hf
        )
        replay_at = rng.randrange(nb)
        compact_at = rng.randrange(nb - 1) if i % 3 == 0 else None
        compacted = False
        for j in range(nb):
            b = sub.where((F.col("doc_id") + salt) % nb == j)
            proc(b, j)
            if j == replay_at:
                proc(b, j)  # at-least-once replay of the same batch id
            if compact_at == j:
                for p in (store, counts):
                    compact_batch_store(spark, p, p + ".c")
                    _shutil.rmtree(p)
                    _shutil.move(p + ".c", p)
                compact_span_store(spark, spans, spans + ".c")
                _shutil.rmtree(spans)
                _shutil.move(spans + ".c", spans)
                compacted = True
        got = sorted(
            map(tuple, current_span_table(spark.read.parquet(spans)).collect())
        )
        want = sorted(
            map(tuple, duplicated_spans(sub, min_tokens=L, hash_fn=hf).collect())
        )
        ok = got == want
        label = (f"spans8 #{i} L={L} hash={hf} nb={nb} m={m}"
                 + (" +compact" if compacted else ""))
        if not ok:
            failures += 1
            miss = [x for x in want if x not in got][:3]
            extra = [x for x in got if x not in want][:3]
            print(f"FAIL  {label}: streamed spans != from-scratch "
                  f"({len(got)} vs {len(want)} rows) missing={miss} extra={extra}")
        else:
            print(f"OK    {label} ({len(got)} spans, {time.time() - t0:.1f}s)")
    return failures


def _stateful_family(spark, tmp, seed, n_stateful, tws: bool) -> int:
    """Run n_stateful random family-5 specs; returns failure count."""
    import random
    import time as _time

    failures = 0
    rocks = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    for i in range(n_stateful):
        t0 = _time.perf_counter()
        rng = random.Random(seed * 1000003 + 83 + i)
        n_keys = rng.randint(1, 8)
        n_files = rng.randint(2, 5)
        rows_per_file = rng.randint(5, 60)
        # reset threshold sized so resets actually fire for busy keys
        # in about half the specs
        exp_per_key = max(1, n_files * rows_per_file // max(1, n_keys))
        reset_at = (rng.randint(2, max(3, exp_per_key))
                    if rng.random() < 0.6 else None)
        sdir = f"{tmp}/f5_{i}/in"
        rid = 0
        for b in range(n_files):
            rows = []
            for _ in range(rows_per_file):
                rows.append((rid, f"k{rng.randrange(n_keys)}",
                             float(rng.randrange(1000))))
                rid += 1
            (spark.createDataFrame(rows, "rid long, key string, value double")
             .coalesce(1).write.json(f"{sdir}/b{b}"))
            _time.sleep(0.05)  # distinct mtimes -> stable batch order

        def stream():
            return (spark.readStream
                    .schema("rid long, key string, value double")
                    .option("maxFilesPerTrigger", "1")
                    .option("recursiveFileLookup", "true")
                    .json(sdir))

        # 1) recorder: capture the EXACT micro-batch composition the
        #    file source produces, so the replay assumes nothing about
        #    file ordering
        recorded: list = []

        def record(bdf, bid, _r=recorded):
            _r.append([(r.rid, r.key, r.value) for r in bdf.collect()])

        q = (stream().writeStream.foreachBatch(record)
             .option("checkpointLocation", f"{tmp}/f5_{i}/ck_rec")
             .trigger(availableNow=True).start())
        _await(q)
        want = _f5_replay(recorded, reset_at)

        def run_side(df_out, ck):
            got: dict = {}

            def upsert(bdf, bid, _g=got):
                for r in bdf.collect():
                    _g[r.key] = (r.n, r.total, r.vmin, r.vmax, r.was_reset)

            qq = (df_out.writeStream.foreachBatch(upsert)
                  .outputMode("update")
                  .option("checkpointLocation", ck)
                  .trigger(availableNow=True).start())
            _await(qq)
            return got

        legacy = run_side(
            stream().groupBy("key").applyInPandasWithState(
                _f5_make_legacy_fn(reset_at),
                outputStructType=_F5_OUT_SCHEMA,
                stateStructType=_F5_STATE_SCHEMA,
                outputMode="update",
                timeoutConf="NoTimeout",
            ),
            f"{tmp}/f5_{i}/ck_legacy",
        )
        ok = legacy == want
        modern = None
        if tws and ok:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", rocks)
            try:
                modern = run_side(
                    stream().groupBy("key").transformWithStateInPandas(
                        statefulProcessor=_f5_make_tws(reset_at),
                        outputStructType=_F5_OUT_SCHEMA,
                        outputMode="Update",
                        timeMode="None",
                    ),
                    f"{tmp}/f5_{i}/ck_tws",
                )
            finally:
                if prev is None:
                    spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
                else:
                    spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
            ok = ok and modern == want
        multi = len([b for b in recorded if b]) >= 2
        ok = ok and multi
        failures += not ok
        print(f"{'OK  ' if ok else 'FAIL'} stateful#{i} keys={n_keys} "
              f"files={n_files} reset_at={reset_at} "
              f"({len(want)} keys, {len(recorded)} batches, "
              f"{_time.perf_counter() - t0:.1f}s)")
        if not ok:
            for name, got in (("legacy", legacy), ("tws", modern)):
                if got is not None and got != want:
                    diff = {k for k in set(got) | set(want)
                            if got.get(k) != want.get(k)}
                    print(f"  {name} diffs: "
                          f"{[(k, got.get(k), want.get(k)) for k in list(diff)[:2]]}")
            if not multi:
                print(f"  only {len([b for b in recorded if b])} non-empty batches")
    return failures


def _ivf_family(spark, tmp: str, seed: int, n_ivf: int, sf_dir: str) -> int:
    """Family 6: randomized streaming ANN-index growth. Returns the
    failure count. Random nlist/mode/batch-count/subset/split-salt per
    spec; one batch replayed mid-stream (foreachBatch's at-least-once
    contract); store compared pairwise to the batch twin, search
    compared on a sampled third, and on another sampled third the
    FULL-PROBE invariant: IVF-Flat stores exact vectors, so probing
    every cell must return exactly the brute-force top-k (identical
    cosine arithmetic and tiebreak) — a drifting or mis-assigned cell
    model cannot hide behind pruning (r11)."""
    import random as _random

    from pyspark.sql import functions as F

    from pyspark_pipeline_framework_spark.llm.similarity import (
        centroids_from_df,
        ivf_add,
        ivf_index,
        ivf_search,
    )
    from pyspark_pipeline_framework_spark.streaming.stateful import (
        streaming_ivf_add_batch,
    )

    rng = _random.Random(seed * 7919 + 66)
    emb_full = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    failures = 0
    for i in range(n_ivf):
        nlist = rng.choice([4, 8, 16])
        mode = rng.choice(["fast", "exact"])
        nb = rng.randint(2, 5)
        m = rng.randint(1, 3)          # corpus subset (m=1 → full table)
        salt = rng.randint(0, 10**6)   # batch-split salt
        t0 = time.time()
        sub = emb_full.where(F.col("vec_id") % m == 0)
        cdf, _ = ivf_index(
            sub, dim=64, nlist=nlist, mode=mode,
            train_sample=rng.choice([128, 256]),
        )
        store = os.path.join(tmp, f"ivf6_{i}")
        proc = streaming_ivf_add_batch(store, cdf, 64, mode=mode)
        replay_at = rng.randrange(nb)
        for j in range(nb):
            b = sub.where((F.col("vec_id") + salt) % nb == j)
            proc(b, j)
            if j == replay_at:
                proc(b, j)  # at-least-once replay of the same batch id
        streamed = spark.read.parquet(store)
        got = sorted((r.vec_id, r.cell) for r in streamed.collect())
        want_df = ivf_add(sub, centroids_from_df(cdf), 64, mode=mode)
        want = sorted((r.vec_id, r.cell) for r in want_df.collect())
        ok = got == want and got
        label = f"ivf6 #{i} nlist={nlist} mode={mode} nb={nb} m={m}"
        if not ok:
            failures += 1
            print(f"FAIL  {label}: streamed store != batch store "
                  f"({len(got)} vs {len(want)} rows)")
            continue
        if i % 3 == 0:
            qids = [r.vec_id for r in sub.limit(3).collect()]
            queries = sub.where(F.col("vec_id").isin(qids)).select(
                F.col("vec_id").alias("query_id"), "embedding"
            )
            kw = dict(dim=64, k=3, nprobe=2, mode=mode)
            s_got = sorted(map(tuple, ivf_search(
                streamed.drop("batch_id"), cdf, queries, **kw).collect()))
            s_want = sorted(map(tuple, ivf_search(
                want_df, cdf, queries, **kw).collect()))
            if s_got != s_want:
                failures += 1
                print(f"FAIL  {label}: streamed search != batch search")
                continue
            label += " +search"
        elif i % 3 == 1:
            # full-probe invariant (r11, sharper than a recall floor):
            # IVF-Flat stores EXACT vectors, so probing every cell must
            # return exactly the brute-force top-k — same cosine
            # arithmetic, same (cos desc, id asc) tiebreak. A drifting
            # or mis-assigned cell model cannot hide behind pruning.
            from pyspark_pipeline_framework_spark.llm.similarity import (
                cosine_topk_bruteforce,
            )

            qids = [r.vec_id for r in sub.limit(3).collect()]
            queries = sub.where(F.col("vec_id").isin(qids)).select(
                F.col("vec_id").alias("query_id"), "embedding"
            )
            cols = ["query_id", "vec_id", "cos_sim", "rank"]
            full = sorted(map(tuple, ivf_search(
                streamed.drop("batch_id"), cdf, queries,
                dim=64, k=3, nprobe=nlist, mode=mode,
            ).select(*cols).collect()))
            brute = sorted(map(tuple, cosine_topk_bruteforce(
                sub, queries, k=3, dim=64,
            ).select(*cols).collect()))
            if full != brute:
                failures += 1
                print(f"FAIL  {label}: full-probe search != brute force")
                continue
            label += " +fullprobe"
        print(f"OK    {label} ({len(got)} rows, {time.time() - t0:.1f}s)")
    return failures


def ivfpq_tick_recall_floor(m_sub: int, ksub: int) -> float:
    """recall@5 floor asserted at EVERY growth tick of family 7 (r10
    VERDICT item 5). The tick searches with nprobe=nlist (FULL probe)
    so the measurement isolates PQ code quality: a drifting/degenerate
    codebook sends full-probe recall toward the random baseline
    (k/n ≈ 0.02 at these corpus sizes), while a healthy model on
    worst-case uniform random vectors stays well above the floor.
    The floor is geometry-aware: 64-dim codes with m_sub=8 subspaces
    are intrinsically coarse (healthy observed 0.16-0.24 over the
    pinning sweeps) where m_sub>=16 sits at 0.40-0.56.

    Cell-pruning quality is separately covered by the
    store==batch-twin equality (model application) and the suite's
    q_sim_knn_ivfpq_recall gate (pruned recall at the pinned
    geometry) — at the fuzzed worst case (nprobe 2 of 8 cells) pruned
    recall of a HEALTHY model is ~0.08, indistinguishable from drift
    at this sample size, which is why the tick probes fully."""
    return 0.2 if m_sub >= 16 else 0.1


def _ivfpq_family(spark, tmp: str, seed: int, n_ivfpq: int, sf_dir: str) -> int:
    """Family 7: randomized streaming IVFPQ-index growth (the
    compressed sibling of family 6). Random nlist/m_sub/ksub/
    batch-count/subset/split-salt per spec; one batch replayed
    mid-stream; the streamed (id, cell, codes) store compared to the
    batch ivfpq_add twin, ADC search compared on a sampled third, and
    recall@5 vs the exact brute-force baseline over the
    vectors-indexed-so-far asserted at EVERY growth tick (>= the
    geometry-aware :func:`ivfpq_tick_recall_floor` — structure checks
    alone would pass a drifting model whose store is self-consistent
    but whose neighbors are garbage; r10 VERDICT item 5)."""
    import random as _random

    from pyspark.sql import functions as F

    from pyspark_pipeline_framework_spark.llm.pq import (
        ivfpq_add,
        ivfpq_index,
        ivfpq_search,
    )
    from pyspark_pipeline_framework_spark.llm.similarity import (
        cosine_topk_bruteforce,
    )
    from pyspark_pipeline_framework_spark.streaming.stateful import (
        streaming_ivfpq_add_batch,
    )

    rng = _random.Random(seed * 7919 + 77)
    emb_full = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    failures = 0
    for i in range(n_ivfpq):
        nlist = rng.choice([4, 8])
        m_sub = rng.choice([8, 16, 32])
        ksub = rng.choice([8, 16])
        nb = rng.randint(2, 4)
        m = rng.randint(1, 3)
        salt = rng.randint(0, 10**6)
        t0 = time.time()
        sub = emb_full.where(F.col("vec_id") % m == 0)
        cdf, cbdf, want_df = ivfpq_index(
            sub, dim=64, nlist=nlist, m_sub=m_sub, ksub=ksub,
            train_sample=rng.choice([128, 256]),
        )
        store = os.path.join(tmp, f"ivfpq7_{i}")
        proc = streaming_ivfpq_add_batch(store, cdf, cbdf, 64)
        replay_at = rng.randrange(nb)
        rq = sub.limit(5).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        floor = ivfpq_tick_recall_floor(m_sub, ksub)
        min_recall, bad_tick = 1.0, None
        for j in range(nb):
            b = sub.where((F.col("vec_id") + salt) % nb == j)
            proc(b, j)
            if j == replay_at:
                proc(b, j)  # at-least-once replay of the same batch id
            # recall tick: the grown store vs exact cosine over exactly
            # the vectors indexed so far
            prefix = sub.where((F.col("vec_id") + salt) % nb <= j)
            approx = {
                (r.query_id, r.vec_id)
                for r in ivfpq_search(
                    spark.read.parquet(store).drop("batch_id"), cdf, cbdf,
                    rq, dim=64, k=5, nprobe=nlist,
                ).collect()
            }
            exact = {
                (r.query_id, r.vec_id)
                for r in cosine_topk_bruteforce(prefix, rq, k=5).collect()
            }
            rec = len(approx & exact) / len(exact) if exact else 1.0
            if rec < min_recall:
                min_recall, bad_tick = rec, j
            if rec < floor:
                break
        if min_recall < floor:
            failures += 1
            print(f"FAIL  ivfpq7 #{i} nlist={nlist} m_sub={m_sub} "
                  f"ksub={ksub}: recall@5 {min_recall:.2f} < {floor} "
                  f"at growth tick {bad_tick}")
            continue
        streamed = spark.read.parquet(store)
        got = sorted((r.vec_id, r.cell, tuple(r.codes)) for r in streamed.collect())
        want = sorted((r.vec_id, r.cell, tuple(r.codes)) for r in want_df.collect())
        ok = got == want and got
        label = (f"ivfpq7 #{i} nlist={nlist} m_sub={m_sub} ksub={ksub} "
                 f"nb={nb} m={m} min_recall={min_recall:.2f}")
        if not ok:
            failures += 1
            print(f"FAIL  {label}: streamed store != batch store "
                  f"({len(got)} vs {len(want)} rows)")
            continue
        if i % 3 == 0:
            qids = [r.vec_id for r in sub.limit(3).collect()]
            queries = sub.where(F.col("vec_id").isin(qids)).select(
                F.col("vec_id").alias("query_id"), "embedding"
            )
            s_got = sorted(map(tuple, ivfpq_search(
                streamed.drop("batch_id"), cdf, cbdf, queries,
                dim=64, k=3, nprobe=2).collect()))
            s_want = sorted(map(tuple, ivfpq_search(
                want_df, cdf, cbdf, queries,
                dim=64, k=3, nprobe=2).collect()))
            if s_got != s_want:
                failures += 1
                print(f"FAIL  {label}: streamed search != batch search")
                continue
            label += " +search"
        elif i % 3 == 2:
            # full-probe invariant (r11): with every cell probed, IVFPQ
            # degenerates to flat PQ-ADC over the SAME codes — the two
            # code paths (cell-pruned candidate join vs flat code scan)
            # must return identical top-k, integer ADC sums included
            from pyspark_pipeline_framework_spark.llm.pq import pq_search_adc

            qids = [r.vec_id for r in sub.limit(3).collect()]
            queries = sub.where(F.col("vec_id").isin(qids)).select(
                F.col("vec_id").alias("query_id"), "embedding"
            )
            cols = ["query_id", "vec_id", "adc_dot", "rank"]
            full = sorted(map(tuple, ivfpq_search(
                streamed.drop("batch_id"), cdf, cbdf, queries,
                dim=64, k=3, nprobe=nlist,
            ).select(*cols).collect()))
            flat = sorted(map(tuple, pq_search_adc(
                streamed.select("vec_id", "codes"), cbdf, queries,
                dim=64, k=3,
            ).select(*cols).collect()))
            if full != flat:
                failures += 1
                print(f"FAIL  {label}: full-probe IVFPQ != flat PQ-ADC")
                continue
            label += " +fullprobe"
        print(f"OK    {label} ({len(got)} rows, {time.time() - t0:.1f}s)")
    return failures


def run(n_dedup: int, n_agg: int, seed: int, sf_dir: str,
        n_join: int = 10, n_session: int = 10, n_stateful: int = 10,
        n_ivf: int = 8, n_ivfpq: int = 6, n_spans: int = 6) -> int:
    import random

    from pyspark.sql import functions as F

    from pyspark_pipeline_framework_spark.io.readers import table
    from pyspark_pipeline_framework_spark.session import SparkConfig, build_session
    from pyspark_pipeline_framework_spark.streaming.joins import stream_stream_join

    _ensure_protobuf()  # before the JVM: workers inherit PYTHONPATH
    spark = build_session(SparkConfig(master="local[8]", shuffle_partitions=8))
    con = duckdb.connect()
    for tname in fuzzcheck.TABLES:
        p = f"{sf_dir}/{tname}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {tname} AS SELECT * FROM read_parquet('{p}')")
    stats = fuzzcheck.probe_stats(con)
    dedup_specs, agg_specs, join_specs, session_specs = _qualifying_specs(
        stats, seed, n_dedup, n_agg, n_join, n_session
    )
    print(f"qualifying specs: {len(dedup_specs)} dedup, {len(agg_specs)} "
          f"update-agg, {len(join_specs)} stream-join, "
          f"{len(session_specs)} session-window")

    # one normalized 4-file copy per base table → 4 micro-batches each
    tmp = tempfile.mkdtemp(prefix="streamfuzz_")
    copies: dict[str, str] = {}

    def multi_file(tbl: str) -> str:
        if tbl not in copies:
            path = f"{tmp}/{tbl}"
            table(spark, sf_dir, tbl).repartition(4).write.parquet(path)
            copies[tbl] = path
        return copies[tbl]

    failures = 0
    t_all = time.time()
    ckpt_i = 0

    for n, spec in enumerate(dedup_specs):
        t0 = time.time()
        keys = spec["terminal"]["cols"]
        path = multi_file("events")
        batch_df = apply_stages(spark.read.parquet(path), spec["stages"], spark, sf_dir)
        want = {tuple(r) for r in batch_df.select(*keys).distinct().collect()}
        schema = spark.read.parquet(path).schema
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", "1").parquet(path))
        out = (apply_stages(stream, spec["stages"], spark, sf_dir)
               .withWatermark("ts", "3650 days")
               .dropDuplicatesWithinWatermark(keys)
               .select(*keys))
        ckpt_i += 1
        qname = f"sfz_dedup_{n}"
        q = (out.writeStream.format("memory").queryName(qname)
             .outputMode("append")
             .option("checkpointLocation", f"{tmp}/ckpt{ckpt_i}")
             .trigger(availableNow=True).start())
        _await(q)
        got = {tuple(r) for r in spark.sql(f"SELECT * FROM {qname}").collect()}
        ok = got == want
        failures += not ok
        print(f"{'OK  ' if ok else 'FAIL'} dedup#{n} keys={keys} "
              f"({len(want)} keys, {time.time() - t0:.1f}s)")
        if not ok:
            print(f"  spec={spec}\n  missing={list(want - got)[:3]} "
                  f"extra={list(got - want)[:3]}")

    for n, spec in enumerate(agg_specs):
        t0 = time.time()
        t = spec["terminal"]
        keys, aliases = t["keys"], [a["alias"] for a in t["aggs"]]
        path = multi_file(spec["base"])
        want = {
            tuple(r[k] for k in keys): tuple(r[a] for a in aliases)
            for r in to_spark(spec, spark, sf_dir,
                              base_df=spark.read.parquet(path)).collect()
        }
        schema = spark.read.parquet(path).schema
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", "1").parquet(path))
        out = to_spark(spec, spark, sf_dir, base_df=stream)
        state: dict = {}
        batches = []

        def upsert(bdf, bid, _state=state, _batches=batches,
                   _keys=keys, _aliases=aliases):
            rows = bdf.collect()
            _batches.append(len(rows))
            for r in rows:
                _state[tuple(r[k] for k in _keys)] = tuple(r[a] for a in _aliases)

        ckpt_i += 1
        q = (out.writeStream.foreachBatch(upsert).outputMode("update")
             .option("checkpointLocation", f"{tmp}/ckpt{ckpt_i}")
             .trigger(availableNow=True).start())
        _await(q)
        ok = state == want
        # the differential is only meaningful if updates actually spread
        # over multiple micro-batches (otherwise it degenerates to the
        # complete-mode check); with 4 input files this must hold
        multi = len(batches) >= 2
        failures += not (ok and multi)
        print(f"{'OK  ' if ok and multi else 'FAIL'} agg#{n} over "
              f"{spec['base']} keys={keys} ({len(want)} groups, "
              f"{len(batches)} update batches, {time.time() - t0:.1f}s)")
        if not ok:
            diff = {k for k in set(state) | set(want)
                    if state.get(k) != want.get(k)}
            print(f"  spec={spec}\n  first diffs={list(diff)[:3]}")
        elif not multi:
            print(f"  spec={spec}\n  only {len(batches)} micro-batch(es)")

    # ---- family 3: stream-stream join -------------------------------
    ev_path = multi_file("events") if join_specs else None
    for n, spec in enumerate(join_specs):
        t0 = time.perf_counter()
        within = random.Random(seed * 1000003 + 17 + n).choice(
            ["2 hours", "12 hours", "2 days"]
        )
        schema = spark.read.parquet(ev_path).schema

        def sides(left_base, right_base):
            left = apply_stages(left_base, spec["stages"], spark, sf_dir).filter(
                F.col("ts").isNotNull()
            )
            right = right_base.filter(F.col("ts").isNotNull()).select(
                "user_id", F.col("ts").alias("rts"), F.col("event_id").alias("r_eid")
            )
            # huge watermark → no state eviction → the streamed result
            # must be EXACTLY the batch join under the same time bound
            return stream_stream_join(
                left, right, on="user_id", left_ts="ts", right_ts="rts",
                watermark="3650 days", within=within, how="inner",
            ).select("user_id", "event_id", "r_eid")

        batch_base = spark.read.parquet(ev_path)
        want = {tuple(r) for r in sides(batch_base, batch_base).collect()}
        stream_base = (spark.readStream.schema(schema)
                       .option("maxFilesPerTrigger", "1").parquet(ev_path))
        stream_base2 = (spark.readStream.schema(schema)
                        .option("maxFilesPerTrigger", "1").parquet(ev_path))
        ckpt_i += 1
        qname = f"sfz_ssj_{n}"
        q = (sides(stream_base, stream_base2)
             .writeStream.format("memory").queryName(qname)
             .outputMode("append")
             .option("checkpointLocation", f"{tmp}/ckpt{ckpt_i}")
             .trigger(availableNow=True).start())
        _await(q)
        nprog = len([p for p in q.recentProgress
                     if p["numInputRows"] > 0])
        got = {tuple(r) for r in spark.sql(f"SELECT * FROM {qname}").collect()}
        ok = got == want and nprog >= 2
        failures += not ok
        print(f"{'OK  ' if ok else 'FAIL'} ssj#{n} within={within} "
              f"({len(want)} pairs, {nprog} data batches, "
              f"{time.perf_counter() - t0:.1f}s)")
        if got != want:
            print(f"  spec={spec}\n  missing={list(want - got)[:3]} "
                  f"extra={list(got - want)[:3]}")
        elif nprog < 2:
            print(f"  spec={spec}\n  only {nprog} data batch(es)")

    # ---- family 4: session-window aggregation -----------------------
    if session_specs:
        # time-ordered quartiles (no late data by construction) + TWO
        # far-future sentinel files: the first advances the watermark
        # past every real session end, the second triggers the batch
        # that emits them (watermark updates apply to the FOLLOWING
        # micro-batch). Neither sentinel's own session can finalize, so
        # the stream output excludes them automatically; the batch twin
        # excludes them with a timestamp filter.
        from pyspark.sql import Window as W

        sdir = f"{tmp}/session_events"
        os.makedirs(sdir, exist_ok=True)
        ev = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
        max_ts = ev.agg(F.max("ts")).first()[0]
        quart = ev.withColumn(
            "__q", F.ntile(4).over(W.partitionBy().orderBy("ts"))
        )
        for i in range(4):
            part_dir = f"{tmp}/__sq{i}"
            quart.filter(F.col("__q") == i + 1).drop("__q") \
                .coalesce(1).write.mode("overwrite").parquet(part_dir)
            src_file = next(f for f in os.listdir(part_dir)
                            if f.endswith(".parquet"))
            shutil.copy(f"{part_dir}/{src_file}", f"{sdir}/{i:02d}.parquet")
        sentinel_ts = max_ts + __import__("datetime").timedelta(days=60)
        for j, days in enumerate((60, 120)):
            sen = spark.createDataFrame(
                [(-1 - j, max_ts + __import__("datetime").timedelta(days=days),
                  -999999, "zz_sentinel", 0.0, "{}")],
                schema=ev.schema,
            )
            part_dir = f"{tmp}/__ssen{j}"
            sen.coalesce(1).write.mode("overwrite").parquet(part_dir)
            src_file = next(f for f in os.listdir(part_dir)
                            if f.endswith(".parquet"))
            shutil.copy(f"{part_dir}/{src_file}", f"{sdir}/{4 + j:02d}.parquet")
        schema = spark.read.parquet(sdir).schema

    for n, spec in enumerate(session_specs):
        t0 = time.perf_counter()
        t = spec["terminal"]
        keys, aliases = t["keys"], [a["alias"] for a in t["aggs"]]
        exprs = [_agg_expr(a) for a in t["aggs"]]
        gap = random.Random(seed * 1000003 + 59 + n).choice(
            ["30 minutes", "2 hours", "6 hours"]
        )
        win = F.session_window("ts", gap)

        def norm(rows):
            # sessions at/after the first sentinel are the sentinels'
            # own (whether the engine happened to flush them or not) —
            # excluded on BOTH sides, mirroring the batch ts cutoff
            return {
                (r["session_window"]["start"], r["session_window"]["end"])
                + tuple(r[k] for k in keys): tuple(r[a] for a in aliases)
                for r in rows
                if r["session_window"]["start"] < sentinel_ts
            }

        batch = apply_stages(
            spark.read.parquet(sdir).filter(F.col("ts") < F.lit(sentinel_ts)),
            spec["stages"], spark, sf_dir,
        )
        want = norm(batch.groupBy(win, *keys).agg(*exprs).collect())
        raw = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", "1").parquet(sdir))
        # the sentinels bypass the spec's stages via a union branch:
        # Catalyst pushes stage FILTERS below the EventTimeWatermark
        # node (they don't reference ts), so a sentinel routed through
        # the stages would be dropped before the watermark collector
        # ever saw its event time — the tail sessions then never flush
        # (observed: final watermark stuck at max-real-ts − delay).
        # Derived columns the stages add are null on the sentinel
        # branch; its own session never finalizes so it is never
        # emitted either way.
        real = apply_stages(raw.filter(F.col("user_id") != -999999),
                            spec["stages"], spark, sf_dir)
        sen = raw.filter(F.col("user_id") == -999999)
        out = (real.unionByName(sen, allowMissingColumns=True)
               .withWatermark("ts", "10 minutes")
               .groupBy(win, *keys).agg(*exprs))
        ckpt_i += 1
        qname = f"sfz_sw_{n}"
        q = (out.writeStream.format("memory").queryName(qname)
             .outputMode("append")
             .option("checkpointLocation", f"{tmp}/ckpt{ckpt_i}")
             .trigger(availableNow=True).start())
        _await(q)
        nprog = len([p for p in q.recentProgress if p["numInputRows"] > 0])
        got = norm(spark.sql(f"SELECT * FROM {qname}").collect())
        ok = got == want and nprog >= 2
        failures += not ok
        print(f"{'OK  ' if ok else 'FAIL'} session#{n} gap={gap} keys={keys} "
              f"({len(want)} sessions, {nprog} data batches, "
              f"{time.perf_counter() - t0:.1f}s)")
        if got != want:
            diff = {k for k in set(got) | set(want) if got.get(k) != want.get(k)}
            print(f"  spec={spec}\n  first diffs={list(diff)[:3]}")
        elif nprog < 2:
            print(f"  spec={spec}\n  only {nprog} data batch(es)")

    # ---- family 6: streaming IVF index growth ------------------------
    # random quantizer size / assignment mode / batch count / corpus
    # subset / batch-split salt, plus ONE injected at-least-once replay
    # per spec: driving streaming_ivf_add_batch batch-by-batch must
    # leave exactly the batch ivf_add store (same frozen quantizer),
    # and on a sampled third of specs ivf_search over the streamed
    # store must equal search over the batch store.
    n_run6 = 0
    if n_ivf:
        failures += _ivf_family(spark, tmp, seed, n_ivf, sf_dir)
        n_run6 = n_ivf

    # ---- family 7: streaming IVFPQ index growth ----------------------
    # same contract as family 6 over the compressed (id, cell, codes)
    # store: frozen quantizer PAIR, injected at-least-once replay,
    # store equality + sampled ADC-search equality vs the batch twin.
    n_run7 = 0
    if n_ivfpq:
        failures += _ivfpq_family(spark, tmp, seed, n_ivfpq, sf_dir)
        n_run7 = n_ivfpq

    # ---- family 8: streaming incremental exact-substring dedup -------
    # (r12) random min_tokens/hash/batch-count/subset/salt, injected
    # at-least-once replay, sampled mid-stream three-store compaction; the
    # corpus-current span table must equal from-scratch duplicated_spans.
    n_run8 = 0
    if n_spans:
        failures += _spans_family(spark, tmp, seed, n_spans, sf_dir)
        n_run8 = n_spans

    # ---- family 5: randomized stateful processors -------------------
    # (VERDICT r7 item 6) random key cardinality / batch splits / state
    # lifecycle, run through BOTH state APIs — the legacy
    # applyInPandasWithState and the Spark-4 transformWithStateInPandas
    # — and differentially checked against a driver-side python replay
    # of the recorded micro-batches. The state machine includes a
    # deterministic reset rule (count threshold → emit + remove state),
    # exercising the remove/recreate lifecycle that timeout paths use;
    # wall-clock timeouts themselves are excluded for determinism
    # (covered on fixed inputs by tests/test_streaming_stateful.py).
    n_run5 = 0
    if n_stateful:
        tws_ok = _tws_available()
        if not tws_ok:
            print("family 5: protobuf unavailable -> "
                  "transformWithStateInPandas side skipped")
        failures += _stateful_family(
            spark, tmp, seed, n_stateful, tws=tws_ok
        )
        n_run5 = n_stateful

    shutil.rmtree(tmp, ignore_errors=True)
    total = (len(dedup_specs) + len(agg_specs)
             + len(join_specs) + len(session_specs)
             ) + n_run5 + n_run6 + n_run7 + n_run8
    print(f"\n{total} stateful streaming specs, {failures} mismatches, "
          f"{time.time() - t_all:.0f}s (seed={seed})")
    return 1 if failures or total < (n_dedup + n_agg + n_join + n_session
                                     + n_stateful + n_ivf + n_ivfpq
                                     + n_spans) else 0


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--n-dedup", type=int, default=12)
    ap.add_argument("--n-agg", type=int, default=12)
    ap.add_argument("--n-join", type=int, default=10)
    ap.add_argument("--n-session", type=int, default=10)
    ap.add_argument("--n-stateful", type=int, default=10)
    ap.add_argument("--n-ivf", type=int, default=8)
    ap.add_argument("--n-ivfpq", type=int, default=6)
    ap.add_argument("--n-spans", type=int, default=6)
    ap.add_argument("--seed", type=int, default=2026)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.01"))
    a = ap.parse_args()
    return run(a.n_dedup, a.n_agg, a.seed, a.sf,
               n_join=a.n_join, n_session=a.n_session,
               n_stateful=a.n_stateful, n_ivf=a.n_ivf, n_ivfpq=a.n_ivfpq,
               n_spans=a.n_spans)


if __name__ == "__main__":
    raise SystemExit(main())
