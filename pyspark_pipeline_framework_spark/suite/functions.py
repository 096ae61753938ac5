"""Scalar function packs — SURVEY.md §2.5 string/date/math/conditional/
array/JSON rows. All JVM-side built-ins (whole-stage codegen); oracles
spell the DuckDB equivalents, with explicit casts where return types
differ (Spark floor→bigint vs DuckDB double, year→int vs bigint, …).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_pipeline_framework_spark.io.readers import table
from pyspark_pipeline_framework_spark.suite import case


@case(
    "q_fn_string",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name)                          AS name_uc,
           LOWER(p_brand)                         AS brand_lc,
           CAST(LENGTH(p_name) AS INT)            AS name_len,
           SUBSTRING(p_name, 1, 8)                AS name_pfx,
           p_brand || '/' || p_type               AS brand_type,
           TRIM(' ' || p_name || '  ')            AS trimmed,
           REGEXP_EXTRACT(p_brand, '[0-9]+')      AS brand_num,
           CAST(STRPOS(p_type, 'a') AS INT)       AS a_pos,
           (p_type LIKE '%br%')                   AS is_br,
           LPAD(CAST(p_size AS VARCHAR), 4, '0')  AS size_padded,
           REPLACE(p_name, ' ', '_')              AS name_us
    FROM part
    """,
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_uc"),
        F.lower("p_brand").alias("brand_lc"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name_pfx"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit("  "))).alias("trimmed"),
        F.regexp_extract("p_brand", "[0-9]+", 0).alias("brand_num"),
        F.instr("p_type", "a").alias("a_pos"),
        F.col("p_type").like("%br%").alias("is_br"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.regexp_replace("p_name", " ", "_").alias("name_us"),
    )


@case(
    "q_fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INT)      AS yr,
           CAST(MONTH(o_orderdate) AS INT)     AS mo,
           CAST(DAY(o_orderdate) AS INT)       AS dom,
           CAST(QUARTER(o_orderdate) AS INT)   AS qtr,
           CAST(DAYOFWEEK(o_orderdate) + 1 AS INT) AS dow,
           date_trunc('month', o_orderdate)    AS month_start,
           CAST(datediff('day', o_orderdate, TIMESTAMP '2000-01-01') AS INT) AS days_to_2000,
           CAST(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS VARCHAR) AS plus3mo,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR)   AS odate,
           CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s
    FROM orders
    """,
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofweek("o_orderdate").alias("dow"),  # 1=Sunday (DuckDB: 0=Sunday)
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate")).alias("days_to_2000"),
        # dates rendered as ISO strings: date-typed cells hash differently
        # across engines' pandas bridges (date vs midnight-timestamp)
        F.date_format(F.add_months("o_orderdate", 3), "yyyy-MM-dd").alias("plus3mo"),
        F.date_format(F.to_date("o_orderdate"), "yyyy-MM-dd").alias("odate"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    )


@case(
    "q_fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(ROUND(CAST(l_extendedprice * l_discount AS DECIMAL(18,6)), 2) AS DOUBLE) AS disc_amt,
           ABS(l_discount - 0.05)                     AS disc_dev,
           CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS price_kfloor,
           CAST(CEIL(l_quantity / 7) AS BIGINT)       AS qty_ceil7,
           SQRT(l_quantity)                           AS qty_sqrt,
           l_quantity * l_quantity                    AS qty_sq,
           l_linenumber % 3                           AS ln_mod3,
           -l_tax                                     AS neg_tax
    FROM lineitem
    """,
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # round via an intermediate DECIMAL(18,6): ROUND on raw doubles
        # disagrees across engines at binary-midpoint values
        F.round((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,6)"), 2)
        .cast("double")
        .alias("disc_amt"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_kfloor"),
        F.ceil(F.col("l_quantity") / 7).alias("qty_ceil7"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        (F.col("l_linenumber") % 3).alias("ln_mod3"),
        (-F.col("l_tax")).alias("neg_tax"),
    )


@case(
    "q_fn_case",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'negative'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END                          AS bal_band,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '(other)') AS seg_or_other,
           GREATEST(c_acctbal, 0.0)                      AS bal_floor0,
           LEAST(c_acctbal, 1000.0)                      AS bal_cap1k,
           (c_acctbal IS NULL)                           AS bal_is_null
    FROM customer
    """,
)
def q_fn_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("bal_band"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("(other)")).alias(
            "seg_or_other"
        ),
        F.greatest("c_acctbal", F.lit(0.0)).alias("bal_floor0"),
        F.least("c_acctbal", F.lit(1000.0)).alias("bal_cap1k"),
        F.col("c_acctbal").isNull().alias("bal_is_null"),
    )


@case(
    "q_fn_array",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT)          AS n_words,
           list_contains(string_split(text, ' '), 'spark')    AS has_spark,
           array_to_string(list_slice(string_split(text, ' '), 1, 3), ' ') AS first3
    FROM documents
    """,
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.array_contains(words, "spark").alias("has_spark"),
        F.array_join(F.slice(words, 1, 3), " ").alias("first3"),
    )


@case(
    "q_agg_collect",
    oracle="""
    SELECT lang,
           array_to_string(list_sort(list(DISTINCT source)), ',') AS srcs,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY lang
    """,
)
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    # collect_set + sort_array: deterministic array agg (plain
    # collect_list order is partition-dependent — never hash-gate it).
    # The array is emitted as a canonical comma-joined STRING on both
    # sides: raw list cells are unhashable in pandas-based comparators.
    return (
        table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.array_join(F.sort_array(F.collect_set("source")), ",").alias("srcs"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


@case(
    "q_fn_explode",
    oracle="""
    SELECT word, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
    """,
)
def q_fn_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@case(
    "q_fn_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_get,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_parsed
    FROM events
    """,
)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    # both extraction styles: path extraction and full from_json parse
    parsed = F.from_json(F.col("props"), "k INT")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_get"),
        parsed.getField("k").alias("k_parsed"),
    )
