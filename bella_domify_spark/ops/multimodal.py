"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are modeled as ``binary`` columns with a metadata struct
(mime, width, height, n_frames). The Spark-side plumbing — schema,
partition-friendly batch processing via ``mapInPandas``, Arrow batch shapes
— is real and tested; the actual codec step is STUBBED (this container has
no image/audio libraries): ``decode_features`` computes deterministic fake
features from the bytes, and raises ``NotImplementedError`` if a real codec
is requested (``codec="real"``).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ])),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("byte_sum", T.LongType()),
    T.StructField("head_hex", T.StringType()),
    T.StructField("thumb", T.ArrayType(T.DoubleType())),
])


def attach_media(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Synthesize a media table from a text table: payload = utf-8 bytes
    (stand-in for image bytes), deterministic fake dimensions derived from
    the payload length."""
    payload = F.encode(F.col(text_col), "utf-8")
    n = F.octet_length(payload)
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            (F.pmod(n, F.lit(640)) + 16).cast("int").alias("width"),
            (F.pmod(n, F.lit(480)) + 16).cast("int").alias("height"),
            (F.pmod(n, F.lit(7)) + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def decode_features(df: DataFrame, codec: str = "stub",
                    batch_hint: int = 256) -> DataFrame:
    """Arrow-batched 'decode' over the binary column via ``mapInPandas``.

    codec="stub": deterministic fake features (length, byte sum, head hex,
    4-element 'thumbnail' = normalized means of byte quartiles).
    codec="real": NotImplementedError — the hook where PIL/ffmpeg decode
    would slot in per Arrow batch on a real cluster image.
    """
    if codec != "stub":
        raise NotImplementedError(
            "real media decoding unavailable in this environment; "
            "plug a codec into decode_features(codec='real')")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload or b"")
                n = len(b)
                q = max(n // 4, 1)
                thumb = [round(sum(b[i * q:(i + 1) * q]) / (255.0 * q), 6)
                         if b[i * q:(i + 1) * q] else 0.0 for i in range(4)]
                out.append({
                    "media_id": mid,
                    "n_bytes": n,
                    "byte_sum": int(sum(b)),
                    "head_hex": b[:8].hex(),
                    "thumb": thumb,
                })
            yield pd.DataFrame(out, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return df.select("media_id", "payload").mapInPandas(decode, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", MEDIA_SCHEMA["meta"].dataType),
])

FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame", T.BinaryType()),
    T.StructField("frame_bytes", T.IntegerType()),
])


def resize_media(df: DataFrame, out_w: int = 64, out_h: int = 64,
                 codec: str = "stub") -> DataFrame:
    """Binary→binary 'resize' over Arrow batches: payload replaced, meta
    dimensions rewritten. Stub codec: the resized payload is the first
    ``out_w*out_h//256`` bytes (byte truncation stands in for pixel
    resampling — the batch plumbing and schema are the real part; a PIL
    resize plugs into the same loop with codec="real")."""
    if codec != "stub":
        raise NotImplementedError(
            "real media resizing unavailable in this environment; "
            "plug a codec into resize_media(codec='real')")
    k = max(out_w * out_h // 256, 1)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload or b"")
                out.append({
                    "media_id": mid,
                    "payload": b[:k],
                    "meta": {"mime": "image/fake", "width": out_w,
                             "height": out_h, "n_frames": 1},
                })
            yield pd.DataFrame(out,
                               columns=[f.name for f in RESIZED_SCHEMA.fields])

    return df.select("media_id", "payload").mapInPandas(run, RESIZED_SCHEMA)


def sample_frames(df: DataFrame, codec: str = "stub") -> DataFrame:
    """Video frame-sampling plumbing: one output row per frame, frame bytes
    sliced from the payload. Stub codec: the payload is treated as
    ``meta.n_frames`` equal fixed-stride chunks (``len // n_frames`` bytes
    each, remainder dropped) — an ffmpeg keyframe extractor plugs into the
    same per-batch loop with codec="real"."""
    if codec != "stub":
        raise NotImplementedError(
            "real frame decoding unavailable in this environment; "
            "plug a codec into sample_frames(codec='real')")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"],
                                          pdf["meta"]):
                b = bytes(payload or b"")
                f_n = max(int(meta["n_frames"] or 1), 1)
                chunk = len(b) // f_n
                if chunk == 0:
                    continue
                for i in range(f_n):
                    out.append({"media_id": mid, "frame_idx": i,
                                "frame": b[i * chunk:(i + 1) * chunk],
                                "frame_bytes": chunk})
            yield pd.DataFrame(out,
                               columns=[f.name for f in FRAME_SCHEMA.fields])

    return df.select("media_id", "payload", "meta").mapInPandas(run, FRAME_SCHEMA)
