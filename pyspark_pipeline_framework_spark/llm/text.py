"""Text-analysis operators: token counting, quality features,
language-ID heuristic, document fingerprinting.

All column expressions are JVM built-ins (whole-stage codegen; no
Python in the hot path) — at 100 TB these run as a single scan with
map-side projection, no shuffle at all unless the caller aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: BPE-ish tokenizer: word pieces, numbers, or single non-space symbols
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

#: tiny marker-word lists for the n-gram/stopword language heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "nicht", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "la", "que", "los", "es"],
    "zh": ["de", "shi", "le", "zai", "he"],
}


def normalize_text(col: Column | str) -> Column:
    """Canonical form for exact dedup: lowercase, trim, collapse runs
    of whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")


def token_count_ws(col: Column | str) -> Column:
    """Whitespace token count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.split(F.trim(c), r"\s+"))


def token_count_regex(col: Column | str, pattern: str = BPE_ISH_PATTERN) -> Column:
    """Token count under a BPE-ish regex (word pieces / digits / symbols)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0)))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features: char/token counts, mean word
    length, punctuation/digit/whitespace ratios, max word repetition."""
    t = F.col(text_col)
    words = F.split(F.trim(t), r"\s+")
    n_chars = F.length(t)
    n_tokens = F.size(words)
    return df.withColumns(
        {
            "q_n_chars": n_chars,
            "q_n_tokens": n_tokens,
            "q_mean_word_len": (n_chars - n_tokens + 1) / n_tokens,
            "q_symbol_ratio": (
                F.length(F.regexp_replace(t, r"[A-Za-z0-9\s]", "")) / n_chars
            ),
            "q_digit_ratio": F.length(F.regexp_replace(t, r"[^0-9]", "")) / n_chars,
            "q_uniq_token_ratio": F.size(F.array_distinct(words)) / n_tokens,
        }
    )


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    min_chars: int = 50,
    max_chars: int = 100_000,
    min_tokens: int = 10,
    max_symbol_ratio: float = 0.3,
    min_uniq_token_ratio: float = 0.1,
) -> DataFrame:
    """Heuristic quality gate (Gopher-rules-style length/symbol/
    repetition bounds) — a pure ``filter`` over :func:`quality_features`
    columns, fully pushed into the scan stage."""
    scored = quality_features(df, text_col)
    return (
        scored.filter(
            (F.col("q_n_chars") >= min_chars)
            & (F.col("q_n_chars") <= max_chars)
            & (F.col("q_n_tokens") >= min_tokens)
            & (F.col("q_symbol_ratio") <= max_symbol_ratio)
            & (F.col("q_uniq_token_ratio") >= min_uniq_token_ratio)
        )
        .drop(*[c for c in scored.columns if c.startswith("q_") and c not in df.columns])
    )


def language_id(
    df: DataFrame,
    text_col: str = "text",
    markers: dict[str, list[str]] | None = None,
    out_col: str = "lang_pred",
) -> DataFrame:
    """Marker-word language heuristic: score = how many of the
    language's marker words occur in the document; argmax with
    lexicographic tiebreak. Pure column expressions (array_intersect
    over the token array) — no UDF, no shuffle."""
    markers = markers or LANG_MARKERS
    words = F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+"))
    scored = F.array(
        *[
            F.struct(
                F.size(F.array_intersect(words, F.array(*[F.lit(w) for w in ws]))).alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang, ws in sorted(markers.items())
        ]
    )
    # deterministic argmax: max score, tie broken by smallest lang code
    max_score = F.array_max(F.transform(scored, lambda s: s["score"]))
    winner = F.array_min(
        F.transform(
            F.filter(scored, lambda s: s["score"] == max_score), lambda s: s["lang"]
        )
    )
    return df.withColumn(out_col, winner)


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Intra-document repetition signals (the Gopher-style quality
    filters): ``top1_frac`` = occurrences of the most frequent word /
    total words, ``top2_frac`` = same for 2-grams (0.0 for documents
    with fewer than two words). High values flag boilerplate and
    degenerate generations before training.

    Scale: explode → count per (doc, gram) → per-doc max/total.
    Grams shuffle hashed by (doc, gram) with map-side partial
    aggregation, so a hot document spreads across reducers until the
    final tiny per-doc combine — no per-row quadratic expressions, no
    UDFs, all whole-stage codegen."""
    words = df.select(
        F.col(id_col), F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("__w")
    )
    s1 = (
        words.select(id_col, F.explode("__w").alias("__g"))
        .groupBy(id_col, "__g")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy(id_col)
        .agg(F.max("__c").alias("__m1"), F.sum("__c").alias("__t1"))
    )
    two_grams = F.zip_with(
        F.slice(F.col("__w"), 1, F.greatest(F.size("__w") - 1, F.lit(0))),
        F.slice(F.col("__w"), 2, F.greatest(F.size("__w") - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    s2 = (
        words.select(id_col, F.explode(two_grams).alias("__g"))
        .groupBy(id_col, "__g")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy(id_col)
        .agg(F.max("__c").alias("__m2"), F.sum("__c").alias("__t2"))
    )
    return s1.join(s2, id_col, "left").select(
        id_col,
        (F.col("__m1").cast("double") / F.col("__t1").cast("double")).alias("top1_frac"),
        F.coalesce(
            F.col("__m2").cast("double") / F.col("__t2").cast("double"), F.lit(0.0)
        ).alias("top2_frac"),
    )


def md5_fingerprint(col: Column | str) -> Column:
    """Content fingerprint: md5 of the normalized text (hex string)."""
    return F.md5(normalize_text(col))


def rolling_shingle_hashes(col: Column | str, k: int = 3) -> Column:
    """Array of xxhash64 values of the k-word shingles of the text —
    the 'rolling hash' fingerprint basis (and MinHash input). JVM-side
    xxhash64: deterministic across executors and sessions."""
    c = F.col(col) if isinstance(col, str) else col
    words = F.split(F.trim(F.lower(c)), r"\s+")
    n = F.size(words)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.transform(idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(words, i, k))))
