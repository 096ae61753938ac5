"""Multimodal columns: image/audio/video as opaque BINARY payloads with
typed metadata structs, processed by Arrow-batched ``mapInPandas``.

The decode stage is PLUGGABLE: :func:`extract_features` takes a
``decode_fn`` codec (+ its output schema); the default is a
deterministic byte-stats STUB because no codec libraries ship in this
container. Everything around the codec — schema, batch shape,
partition-preserving plumbing — is real and tested: inject a
PIL/ffmpeg-backed ``decode_fn`` and the pipeline is production shape.
At 100 TB the binary payloads stream through Arrow record batches
executor-side and never visit the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata struct carried alongside every binary payload
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),   # image|audio|video
        T.StructField("format", T.StringType(), True),        # png|wav|mp4|...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", media_type: str = "image"
) -> DataFrame:
    """Demo payload builder for the testdata: encodes text to a binary
    column + metadata struct. In production the binary comes from the
    source (parquet BINARY / object-store blobs)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8")).withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit("raw").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    )


def _decode_stub(payload: bytes) -> dict:
    """STUB decode: real image/audio decode needs PIL/torchaudio/ffmpeg,
    which are not in this container. Returns deterministic fake
    features (byte stats) with the production signature. Replace the
    body — not the plumbing — to go live."""
    head = payload[:16]
    return {
        "n_bytes": len(payload),
        "head_checksum": int(sum(head)),
        "feature": [float(b) / 255.0 for b in head[:4]],
    }


FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, head_checksum long, feature array<double>"
)


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    decode_fn=None,
    feature_schema: str | None = None,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads. Batches
    stay columnar end-to-end; partitioning is inherited from the scan
    (no shuffle).

    ``decode_fn(payload: bytes) -> dict`` is the pluggable codec —
    inject a PIL/ffmpeg-backed decoder here; the deterministic
    byte-stats stub is only the DEFAULT. ``feature_schema`` is the
    output DDL (id column first, then one field per key the codec
    returns); it defaults to the stub's :data:`FEATURE_SCHEMA`. The
    codec is shipped to executors by closure serialization — keep it
    self-contained (import its libs inside the function)."""
    if (decode_fn is None) != (feature_schema is None):
        raise ValueError("decode_fn and feature_schema must be supplied together")
    decode = decode_fn or _decode_stub
    schema = feature_schema or FEATURE_SCHEMA
    feat_cols = [
        f.strip().split()[0] for f in schema.split(",")
    ]
    if feat_cols[0] != id_col:
        raise ValueError(f"feature_schema must lead with the id column {id_col!r}")
    feat_cols = feat_cols[1:]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decode(p) for p in pdf["payload"]]
            out = {id_col: pdf[id_col].values}
            for c in feat_cols:
                out[c] = [f[c] for f in feats]
            yield pd.DataFrame(out)

    return df.select(id_col, "payload").mapInPandas(batches, schema=schema)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    timestamp (the decode itself is the stub above). Demonstrates the
    explode-shaped fan-out that keeps frame extraction distributed."""
    return df.withColumn(
        "frame_ts_ms",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.coalesce(F.col("media_meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ),
    )
