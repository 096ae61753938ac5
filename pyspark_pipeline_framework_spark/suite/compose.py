"""Framework-composition cases: the declarative pipeline runner and the
skew-safe join, each verified against plain SQL — proving the
orchestration layer doesn't change query semantics."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyspark_pipeline_framework_spark.io.readers import table
from pyspark_pipeline_framework_spark.operators.joins import salted_join
from pyspark_pipeline_framework_spark.plans.config import ComponentConfig, PipelineConfig
from pyspark_pipeline_framework_spark.plans.runner import PipelineRunner
from pyspark_pipeline_framework_spark.resilience.presets import NO_RETRY
from pyspark_pipeline_framework_spark.suite import case


@case(
    "q_pipeline_compose",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY c.c_mktsegment
    """,
)
def q_pipeline_compose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A 3-component declarative pipeline (read → read → sql) whose
    stages fuse into one Catalyst plan; the case returns the final
    dataset from the runner's catalog."""
    config = PipelineConfig(
        "compose_demo",
        [
            ComponentConfig(
                name="load_orders", op="read", output="p_orders",
                params={
                    "format": "parquet",
                    "path": f"{sf_dir}/orders.parquet",
                    "filter_condition": "o_orderstatus = 'F'",
                },
            ),
            ComponentConfig(
                name="load_customer", op="read", output="p_customer",
                params={"format": "parquet", "path": f"{sf_dir}/customer.parquet"},
            ),
            ComponentConfig(
                name="segment_revenue", op="sql", output="p_seg_rev",
                depends_on=["load_orders", "load_customer"],
                params={
                    "sql": """
                    SELECT c.c_mktsegment,
                           COUNT(*) AS n_orders,
                           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue
                    FROM p_orders o JOIN p_customer c ON o.o_custkey = c.c_custkey
                    GROUP BY c.c_mktsegment
                    """,
                },
            ),
        ],
    )
    runner = PipelineRunner(config, spark, resilience=NO_RETRY)
    result = runner.run()
    if not result.succeeded:
        raise RuntimeError(f"pipeline failed: {[c.error for c in result.components]}")
    return runner.catalog.get("p_seg_rev")


@case(
    "q_join_salted",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, l.l_linenumber, l.l_quantity
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_totalprice > 200000
    """,
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew-join must be result-identical to the plain join."""
    from pyspark.sql import functions as F

    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000).select(
        "o_orderkey", "o_custkey"
    )
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")
    joined = salted_join(
        l.withColumnRenamed("l_orderkey", "o_orderkey"), o, on=["o_orderkey"], salt=8
    )
    return joined.select("o_orderkey", "o_custkey", "l_linenumber", "l_quantity")
