"""Benchmark harness — runs headline suite queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _calibrate() -> float:
    """Single-thread CPU probe (fixed md5 chain): the host is a shared
    VM whose effective throughput varies several-fold minute to minute
    (documented 35× swings on identical numpy matmuls), so absolute
    wall-clock comparisons across bench runs are meaningless without a
    machine-speed reference. Compare suite totals as value/calib_sec."""
    import hashlib

    t0 = time.perf_counter()
    h = b"calib"
    for _ in range(400_000):
        h = hashlib.md5(h).digest()
    return time.perf_counter() - t0


def _steal_jiffies() -> int | None:
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])
    except Exception:
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    steal0 = _steal_jiffies()
    calib = min(_calibrate(), _calibrate())

    from pyspark_pipeline_framework_spark.session import SparkConfig, build_session
    from pyspark_pipeline_framework_spark.suite import all_cases

    spark = build_session(
        SparkConfig(
            master=f"local[{cpus}]",
            shuffle_partitions=int(cpus),
            app_name="ppfs-bench",
        )
    )

    # warm the JVM + parquet footers once so the numbers measure the queries
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    # best-of-2: the first run of each query pays one-time JIT/codegen
    # compilation that a long-lived cluster job would amortize away
    timings: dict[str, float] = {}
    for name, case in sorted(all_cases().items()):
        samples, n = [], 0
        for _ in range(2):
            t0 = time.perf_counter()
            df = case.spark_fn(spark, sf_dir)
            n = df.count()  # full execution without driver-side materialization
            samples.append(time.perf_counter() - t0)
        # host-noise guard: when the two samples disagree badly, a steal
        # burst hit one of them — take a third and keep the min
        if max(samples) > 1.6 * min(samples) + 0.05:
            t0 = time.perf_counter()
            case.spark_fn(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(min(samples), 4)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf

    # Full per-query detail goes to a repo file (committed per round, so
    # rounds can be diffed query-by-query); the stdout line must stay
    # under the driver's 2000-byte tail buffer or it records parsed=null,
    # so it carries only the slowest queries.
    steal1 = _steal_jiffies()
    steal_s = round((steal1 - steal0) / 100.0, 1) if steal0 is not None else None
    full = {
        "metric": "suite_total_sec",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "n_queries": len(timings),
        "sf": sf_val,
        "calib_sec": round(calib, 4),
        "steal_sec": steal_s,
        "queries": timings,
    }
    try:
        with open(os.path.join(REPO, "BENCH_FULL.json"), "w") as f:
            json.dump(full, f, indent=1, sort_keys=True)
            f.write("\n")
    except OSError as e:  # read-only checkout: the stdout line still lands
        print(f"# BENCH_FULL.json not written: {e}", file=sys.stderr)

    line_obj = {
        "metric": "suite_total_sec",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "n_queries": len(timings),
        "sf": sf_val,
        "calib_sec": round(calib, 4),
        "steal_sec": steal_s,
        "queries_full": "BENCH_FULL.json",
        "queries": {},
    }
    budget = 1900  # driver tail keeps the last 2000 bytes
    for name, t in sorted(timings.items(), key=lambda kv: -kv[1]):
        line_obj["queries"][name] = t
        if len(json.dumps(line_obj, separators=(",", ":"))) > budget:
            del line_obj["queries"][name]
            break
    print(json.dumps(line_obj, separators=(",", ":")))


if __name__ == "__main__":
    main()
