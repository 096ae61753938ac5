"""Every registered suite case runs at sf0.001 and returns a sane frame."""

import duckdb
import pytest

from pyspark_pipeline_framework_spark.io.readers import STAR_TABLES
from pyspark_pipeline_framework_spark.suite import all_cases


def test_registry_nonempty():
    assert len(all_cases()) >= 1


@pytest.mark.parametrize("name", sorted(all_cases()))
def test_case_runs(spark, sf_dir, name):
    c = all_cases()[name]
    df = c.spark_fn(spark, sf_dir)
    rows = df.limit(5).collect()
    assert df.columns, name
    assert rows is not None


def test_oracles_parse(sf_dir):
    con = duckdb.connect()
    for t in STAR_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    for name, c in all_cases().items():
        if c.oracle:
            con.execute(c.oracle).fetchone()


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    q, o = e.queries(), e.oracle_sql()
    assert set(o) <= set(q)
