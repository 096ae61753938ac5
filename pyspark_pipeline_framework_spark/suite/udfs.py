"""Python UDF surface — SURVEY.md §2.5 UDF/UDAF/UDTF rows.

The slow-path escape hatch, done the fast way: Arrow-batched
``pandas_udf`` for scalars, ``applyInPandas`` for grouped custom
aggregation, a Python UDTF for one-row→many. Each declared case has an
exact SQL equivalent so the oracle stays meaningful; anything
float-order-dependent (e.g. np.sum) is avoided inside UDFs — medians
and element-wise math are deterministic.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_pipeline_framework_spark.io.readers import table
from pyspark_pipeline_framework_spark.suite import case


@case(
    "q_udf_scalar",
    oracle="""
    SELECT doc_id,
           CAST(LENGTH(text) AS DOUBLE) / (1.0 + len(string_split(text, ' '))) AS chars_per_word
    FROM documents
    """,
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf("double")
    def chars_per_word(text: pd.Series) -> pd.Series:
        # vectorized, Arrow-batched; element-wise ops are IEEE-deterministic
        return text.str.len() / (1.0 + text.str.split(" ").str.len())

    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", chars_per_word("text").alias("chars_per_word"))


@case(
    "q_udaf_grouped",
    oracle="""
    SELECT lang,
           CAST(median(n_chars) AS DOUBLE) AS median_chars,
           CAST(COUNT(*) AS BIGINT)        AS n
    FROM documents GROUP BY lang
    """,
)
def q_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    # grouped custom aggregation via applyInPandas (Spark has no native
    # Python UDAF); median = sort-based → order-independent, hash-safe
    def group_median(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "lang": [pdf["lang"].iloc[0]],
                "median_chars": [float(pdf["n_chars"].median())],
                "n": [len(pdf)],
            }
        )

    d = table(spark, sf_dir, "documents").select("lang", "n_chars")
    return d.groupBy("lang").applyInPandas(
        group_median, schema="lang string, median_chars double, n bigint"
    )


@case(
    "q_udtf",
    oracle="""
    SELECT doc_id, word, CAST(LENGTH(word) AS INT) AS wlen
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
    WHERE word <> ''
    """,
)
def q_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one-row→many via a Python UDTF (Spark 3.5+); falls back to
    # explode if the UDTF API is unavailable in the runtime
    d = table(spark, sf_dir, "documents")
    try:
        from pyspark.sql.functions import udtf

        @udtf(returnType="word: string, wlen: int")
        class WordStream:
            def eval(self, doc_id: int, text: str):  # noqa: ANN001
                for w in (text or "").split(" "):
                    if w:
                        yield w, len(w)

        spark.udtf.register("word_stream", WordStream)
        d.createOrReplaceTempView("__udtf_docs")
        return spark.sql(
            """
            SELECT d.doc_id, t.word, t.wlen
            FROM __udtf_docs d, LATERAL word_stream(d.doc_id, d.text) t
            """
        )
    except Exception:
        return (
            d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
            .filter(F.col("word") != "")
            .withColumn("wlen", F.length("word").cast("int"))
        )
