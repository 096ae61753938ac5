"""TPC-H Q2/Q9/Q11/Q16/Q20-shaped queries — completing the 22-query
set (Q1 = ``q_agg_group``; 3-22 across ``tpch.py``/``tpch2.py``/here).

The driver schema has NO ``partsupp`` table (TESTDATA.md), so the four
partsupp-dependent queries are adapted with documented proxies while
preserving each query's relational SHAPE (the part Catalyst must
handle):

- Q2  — per-part supply cost proxied by the per-(part, supplier)
  average unit sale price from lineitem; min-cost-supplier-per-part
  keeps the correlated-min shape (expressed as a ranked window).
- Q9  — supply cost proxied as 50% of ``p_retailprice``.
- Q11 — inventory value proxied by retail value of shipped volume;
  keeps the HAVING-against-global-aggregate scalar-subquery shape.
- Q16 — "suppliers who can supply" proxied by suppliers who shipped
  the part; customer-complaint exclusion proxied by negative
  ``s_acctbal``; keeps the NOT-IN anti-join + count-distinct shape.
- Q20 — excess-stock threshold proxied by a fixed shipped-quantity
  threshold; keeps the nested IN-subquery shape.

All money math goes through DECIMAL(38,6) sums (order-independent,
oracle-exact); rank windows carry unique tiebreakers."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_pipeline_framework_spark.io.readers import table
from pyspark_pipeline_framework_spark.suite import case
from pyspark_pipeline_framework_spark.suite._util import dsum, o_dsum


@case(
    "q_tpch_q2",
    oracle=f"""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             {o_dsum('l_extendedprice')} / {o_dsum('l_quantity')} AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), eur AS (
      SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
    ), ranked AS (
      SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_name,
             ps.unit_cost,
             ROW_NUMBER() OVER (PARTITION BY p.p_partkey
                                ORDER BY ps.unit_cost, ps.l_suppkey) AS rn
      FROM ps
      JOIN eur e ON ps.l_suppkey = e.s_suppkey
      JOIN part p ON ps.l_partkey = p.p_partkey
      WHERE p.p_type = 'PROMO' AND p.p_size <= 25
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
    FROM ranked WHERE rn = 1
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-cost supplier per part (Q2 shape): aggregate the
    partsupp proxy, broadcast the filtered supplier dim, rank within
    part. One shuffle for the proxy agg, one for the rank window."""
    eur = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(table(spark, sf_dir, "nation")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    # push the supplier-region filter BELOW the unit-cost aggregate
    # (broadcast semi-join): only EUROPE suppliers' rows feed the
    # (part, supplier) groupBy — identical result, ~85% less agg input
    l = table(spark, sf_dir, "lineitem").join(
        F.broadcast(eur.select("s_suppkey")),
        F.col("l_suppkey") == F.col("s_suppkey"),
        "left_semi",
    )
    ps = l.groupBy("l_partkey", "l_suppkey").agg(
        (dsum("l_extendedprice") / dsum("l_quantity")).alias("unit_cost")
    )
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "PROMO") & (F.col("p_size") <= 25)
    )
    w = Window.partitionBy("p_partkey").orderBy(F.col("unit_cost").asc(), F.col("l_suppkey").asc())
    return (
        ps.join(F.broadcast(eur), ps.l_suppkey == eur.s_suppkey)
        .join(p, ps.l_partkey == p.p_partkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "unit_cost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@case(
    "q_tpch_q9",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(((l.l_extendedprice * (1 - l.l_discount))
                          - ((0.5 * p.p_retailprice) * l.l_quantity))
                    AS DECIMAL(38,6))) AS DOUBLE) AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY n.n_name, year(o.o_orderdate)
    """,
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-line profit by supplier nation and order year (Q9
    shape): fact-fact lineitem⋈orders shuffle join, broadcast dims,
    partial agg before the (nation, year) shuffle."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders")
    profit = (F.col("l_extendedprice") * (1 - F.col("l_discount"))) - (
        (F.lit(0.5) * F.col("p_retailprice")) * F.col("l_quantity")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(dsum(profit).alias("sum_profit"))
    )


@case(
    "q_tpch_q11",
    oracle=f"""
    WITH rows_ AS (
      SELECT l.l_partkey, p.p_retailprice * l.l_quantity AS v
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_7'
    )
    SELECT l_partkey AS p_partkey, {o_dsum('v')} AS value
    FROM rows_
    GROUP BY l_partkey
    HAVING {o_dsum('v')} > (SELECT {o_dsum('v')} * 0.001 FROM rows_)
    """,
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important-stock (Q11 shape): per-part value vs a global-total
    scalar subquery. The total is a one-row broadcast cross join, the
    same pattern the plan gates allow (no cartesian product)."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    rows = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_partkey", (F.col("p_retailprice") * F.col("l_quantity")).alias("v"))
    )
    per_part = rows.groupBy(F.col("l_partkey").alias("p_partkey")).agg(dsum("v").alias("value"))
    total = rows.agg((dsum("v") * F.lit(0.001)).alias("__threshold"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("__threshold"))
        .select("p_partkey", "value")
    )


@case(
    "q_tpch_q16",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-relationship counts (Q16 shape): NOT-IN exclusion as a
    broadcast anti-join, count-distinct after a (part-attr, supplier)
    dedup."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    # NOT IN ≡ left_anti only when neither side's key is NULL (SQL NOT IN
    # yields zero rows if the subquery contains a NULL). s_suppkey is the
    # supplier PK and l_suppkey a FK — both non-null by TPC-H schema — and
    # the isNotNull filter below makes the equivalence explicit anyway.
    complained = (
        table(spark, sf_dir, "supplier")
        .filter((F.col("s_acctbal") < 0) & F.col("s_suppkey").isNotNull())
        .select("s_suppkey")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(complained), l.l_suppkey == complained.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
    )


@case(
    "q_tpch_q20",
    oracle=f"""
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE '%bolt%'
          AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l.l_suppkey
        HAVING {o_dsum('l_quantity')} > 250
      )
    ORDER BY s_name
    """,
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Potential-promotion suppliers (Q20 shape): nested IN-subquery
    with HAVING becomes an aggregated inner frame + left-semi join."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    bolt = table(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    heavy = (
        l.join(F.broadcast(bolt), l.l_partkey == bolt.p_partkey)
        .groupBy("l_suppkey")
        .agg(dsum("l_quantity").alias("q"))
        .filter(F.col("q") > 250)
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )
