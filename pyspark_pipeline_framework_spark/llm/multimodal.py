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

import struct as _struct
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


def sniff_media(payload: bytes) -> dict:
    """REAL media-header decoding — no codec libraries required:
    magic-byte format sniffing plus container-header dimensions /
    duration for PNG, JPEG, GIF, BMP, and WAV. This is the part of
    "decode" that needs only the spec, so it is implemented for real
    (unlike pixel/sample decode, which stays behind the pluggable
    ``decode_fn``):

    - PNG: 8-byte signature, IHDR width/height (big-endian u32 @16/@20)
    - JPEG: SOI then segment walk to the first SOFn (C0-CF minus
      C4/C8/CC), height/width big-endian u16 at +5/+7
    - GIF: GIF87a/GIF89a, logical-screen w/h little-endian u16 @6/@8
    - BMP: 'BM', BITMAPINFOHEADER w/h little-endian i32 @18/@22
      (height may be negative = top-down; absolute value reported)
    - WAV: RIFF/WAVE chunk walk — duration_ms = data-chunk bytes /
      fmt byte-rate

    Unknown or truncated payloads degrade to None fields, never raise —
    a 100 TB corpus always contains garbage rows and a prober that
    throws poisons whole Arrow batches."""
    out: dict = {"format": None, "width": None, "height": None, "duration_ms": None}
    p = bytes(payload)
    try:
        if p[:8] == b"\x89PNG\r\n\x1a\n":
            out["format"] = "png"
            if len(p) >= 24 and p[12:16] == b"IHDR":
                w, h = _struct.unpack(">II", p[16:24])
                out["width"], out["height"] = int(w), int(h)
        elif p[:2] == b"\xff\xd8":
            out["format"] = "jpeg"
            i = 2
            while i + 1 < len(p) and p[i] == 0xFF:
                # spec: any number of 0xFF fill bytes may pad a marker
                while i < len(p) and p[i] == 0xFF:
                    i += 1
                if i >= len(p):
                    break
                marker = p[i]
                i += 1
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    continue  # standalone markers carry no length
                if marker in (0xDA, 0xD9):
                    break  # SOS/EOI: entropy-coded data follows, stop
                if i + 2 > len(p):
                    break
                seglen = _struct.unpack(">H", p[i:i + 2])[0]
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    if i + 7 <= len(p):
                        h, w = _struct.unpack(">HH", p[i + 3:i + 7])
                        out["width"], out["height"] = int(w), int(h)
                    break
                i += seglen  # seglen counts its own 2 bytes
        elif p[:6] in (b"GIF87a", b"GIF89a"):
            out["format"] = "gif"
            w, h = _struct.unpack("<HH", p[6:10])
            out["width"], out["height"] = int(w), int(h)
        elif p[:2] == b"BM" and len(p) >= 26:
            out["format"] = "bmp"
            w, h = _struct.unpack("<ii", p[18:26])
            out["width"], out["height"] = abs(int(w)), abs(int(h))
        elif p[:4] == b"RIFF" and p[8:12] == b"WAVE":
            out["format"] = "wav"
            i, byte_rate, data_size = 12, None, None
            while i + 8 <= len(p):
                cid = p[i:i + 4]
                csize = _struct.unpack("<I", p[i + 4:i + 8])[0]
                if cid == b"fmt " and i + 20 <= len(p):
                    byte_rate = _struct.unpack("<I", p[i + 16:i + 20])[0]
                elif cid == b"data":
                    data_size = csize
                i += 8 + csize + (csize & 1)
            if byte_rate and data_size is not None:
                out["duration_ms"] = int(data_size) * 1000 // int(byte_rate)
    except (_struct.error, IndexError):
        pass  # truncated mid-header: keep the sniffed format, None dims
    return out


MEDIA_PROBE_SCHEMA = (
    "doc_id long, format string, width int, height int, duration_ms long"
)


def probe_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Distributed media probing: :func:`sniff_media` plugged into the
    same Arrow ``mapInPandas`` plumbing as :func:`extract_features` —
    map-only, payloads never leave the executors. The output schema
    leads with ``id_col`` at its ACTUAL input type (looked up from
    ``df.schema``), so any id column name/type works."""
    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, format string, width int, height int, duration_ms long"
    return extract_features(df, id_col, decode_fn=sniff_media, feature_schema=schema)


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
