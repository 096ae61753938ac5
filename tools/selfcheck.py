"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` case on Spark and (where present) its
``oracle_sql()`` on DuckDB over the same parquet, then compares
row count + name-sorted schema + order-insensitive values.

Usage: python tools/selfcheck.py [sf_dir] [case ...]

Layout sweeps (r9): set SELFCHECK_SHUFFLE_PARTITIONS / SELFCHECK_AQE /
SELFCHECK_ANSI to replay the whole gate under an alternate physical
layout or ANSI mode — results must be identical (see FUZZCHECK.md).

Connect simulation (r11): SELFCHECK_CONNECT_SIM=1 installs the same
classic-only-surface gate as tests/test_connect_clean.py (every
``sparkContext`` / ``DataFrame.rdd`` touch from NON-pyspark code
raises, exactly as on a Spark Connect client) and then runs the whole
oracle gate under it — proving the entire suite surface, not just the
smoke subset, never needs the classic API.
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark_pipeline_framework_spark.io.readers import STAR_TABLES  # noqa: E402


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)  # full precision — we demand bit-exactness
    if isinstance(v, (pd.Timestamp,)):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm_cell(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def _norm_df(pdf: pd.DataFrame) -> list[tuple]:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    rows = [tuple(_norm_cell(v) for v in row) for row in pdf.itertuples(index=False, name=None)]
    return sorted(rows)


def _install_connect_sim_gate() -> None:
    """Remove the classic-only surface for non-pyspark code, mirroring
    the ``connectish`` fixture (tests/test_connect_clean.py): class-
    level data descriptors win over instance state, so every
    ``sparkContext`` / ``.rdd`` touch anywhere in the package, suite,
    entry module or this tool raises AttributeError like a real
    Connect client. pyspark-internal frames pass through — on a real
    Connect client those are the Connect implementations, which never
    need a SparkContext; on this classic backend they still do."""
    import inspect

    from pyspark.sql import SparkSession
    from pyspark.sql.classic.dataframe import DataFrame as ClassicDataFrame

    orig_sc = SparkSession.sparkContext.fget
    rdd_attr = ClassicDataFrame.rdd  # property or cached_property by version
    orig_rdd = getattr(rdd_attr, "fget", None) or rdd_attr.func

    def _gate(name, orig):
        def impl(self):
            caller = inspect.stack()[1].filename.replace("\\", "/")
            if "/pyspark/" in caller:
                return orig(self)
            raise AttributeError(
                f"[ATTRIBUTE_NOT_SUPPORTED] {name} is not supported on "
                f"Spark Connect (simulated; caller: {caller})"
            )

        return impl

    SparkSession.sparkContext = property(_gate("sparkContext", orig_sc))
    ClassicDataFrame.rdd = property(_gate("rdd", orig_rdd))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark_pipeline_framework_spark.session import SparkConfig, build_session

    # Partition-invariance sweeps (r9): the suite's answers must not
    # depend on the shuffle partition count — override it (and AQE) to
    # re-run the ENTIRE oracle gate under a different physical layout.
    sp = int(os.environ.get("SELFCHECK_SHUFFLE_PARTITIONS", "8"))
    spark = build_session(SparkConfig(master="local[8]", shuffle_partitions=sp))
    aqe = os.environ.get("SELFCHECK_AQE")
    if aqe is not None:
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
    ansi = os.environ.get("SELFCHECK_ANSI")
    if ansi is not None:
        spark.conf.set("spark.sql.ansi.enabled", ansi)
    if os.environ.get("SELFCHECK_CONNECT_SIM") == "1":
        _install_connect_sim_gate()
        print("# connect-sim: classic-only surface gated for non-pyspark code")

    con = duckdb.connect()
    for t in STAR_TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {ex}")
            continue
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(spdf)} rows, {time.time()-t0:.1f}s) [no oracle]")
            continue
        try:
            opdf = con.execute(oracles[name]).df()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: oracle error: {ex}")
            continue
        scols, ocols = sorted(spdf.columns), sorted(opdf.columns)
        if scols != ocols:
            failures.append(name)
            print(f"FAIL  {name}: columns differ spark={scols} oracle={ocols}")
            continue
        if len(spdf) != len(opdf):
            failures.append(name)
            print(f"FAIL  {name}: rowcount spark={len(spdf)} oracle={len(opdf)}")
            continue
        srows, orows = _norm_df(spdf), _norm_df(opdf)
        if srows != orows:
            failures.append(name)
            bad = next(i for i, (a, b) in enumerate(zip(srows, orows)) if a != b)
            print(f"FAIL  {name}: values differ at sorted-row {bad}:")
            print(f"      spark : {srows[bad]}")
            print(f"      oracle: {orows[bad]}")
            continue
        print(f"OK    {name} ({len(spdf)} rows, {time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
