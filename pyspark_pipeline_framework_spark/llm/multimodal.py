"""Multimodal columns: image/audio/video as opaque BINARY payloads with
typed metadata structs, processed by Arrow-batched ``mapInPandas``.

The decode stage is STUBBED (no codec libraries in this container —
clearly marked below); everything around it — schema, batch shape,
partition-preserving plumbing — is real and tested. Swap
``_decode_stub`` for a PIL/ffmpeg call and the pipeline is production
shape: at 100 TB the binary payloads stream through Arrow record
batches executor-side and never visit the driver.
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


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads. Batches
    stay columnar end-to-end; partitioning is inherited from the scan
    (no shuffle)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [_decode_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "head_checksum": [f["head_checksum"] for f in feats],
                    "feature": [f["feature"] for f in feats],
                }
            )

    return df.select(id_col, "payload").mapInPandas(batches, schema=FEATURE_SCHEMA)


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
