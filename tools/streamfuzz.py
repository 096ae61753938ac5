"""Stateful-streaming differential fuzzing: random fuzz specs replayed
through Structured Streaming STATEFUL paths and asserted equal to their
batch plans.

Two families (VERDICT r5 item 7 — the r5 differential covered
complete-mode aggregation only):

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

Determinism: both sides read the SAME materialized multi-file parquet
copy (written once per table via io.readers.table, which normalizes
the events nanos timestamps), and every compared value is a key set or
an exact aggregate (no floats beyond bit-exact min/max).

Usage: python tools/streamfuzz.py [--n-dedup 12] [--n-agg 12]
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


def _qualifying_specs(stats: dict, seed: int, n_dedup: int, n_agg: int):
    """Scan the seeded spec stream for the two qualifying families."""
    dedup, agg = [], []
    i = 0
    while (len(dedup) < n_dedup or len(agg) < n_agg) and i < 4000:
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
    return dedup, agg


def _await(q, timeout_s: int = 180) -> None:
    q.awaitTermination(timeout_s)
    if q.isActive:
        q.stop()
        raise TimeoutError("streaming query did not finish in time")


def run(n_dedup: int, n_agg: int, seed: int, sf_dir: str) -> int:
    from pyspark.sql import functions as F

    from pyspark_pipeline_framework_spark.io.readers import table
    from pyspark_pipeline_framework_spark.session import SparkConfig, build_session

    spark = build_session(SparkConfig(master="local[8]", shuffle_partitions=8))
    con = duckdb.connect()
    for tname in fuzzcheck.TABLES:
        p = f"{sf_dir}/{tname}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {tname} AS SELECT * FROM read_parquet('{p}')")
    stats = fuzzcheck.probe_stats(con)
    dedup_specs, agg_specs = _qualifying_specs(stats, seed, n_dedup, n_agg)
    print(f"qualifying specs: {len(dedup_specs)} dedup, {len(agg_specs)} update-agg")

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

    shutil.rmtree(tmp, ignore_errors=True)
    total = len(dedup_specs) + len(agg_specs)
    print(f"\n{total} stateful streaming specs, {failures} mismatches, "
          f"{time.time() - t_all:.0f}s (seed={seed})")
    return 1 if failures or total < (n_dedup + n_agg) else 0


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--n-dedup", type=int, default=12)
    ap.add_argument("--n-agg", type=int, default=12)
    ap.add_argument("--seed", type=int, default=2026)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.01"))
    a = ap.parse_args()
    return run(a.n_dedup, a.n_agg, a.seed, a.sf)


if __name__ == "__main__":
    raise SystemExit(main())
