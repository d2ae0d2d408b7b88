"""Multimodal column plumbing (training-data pipeline ops).

Images / audio / video are opaque `binary` columns with typed metadata
structs.  The Spark-side plumbing — schema, Arrow batch shape, partition
sizing — is real and tested; the codec step is STUBBED (the container has no
image/audio libraries): `decode_media(..., fake=False)` raises
NotImplementedError, while `fake=True` produces a deterministic feature
vector from the bytes so the distributed path can be exercised end-to-end.

At 100 TB the pattern matters more than the codec: binary columns are
excluded from every scan that does not need them (column pruning), batches
are kept small via spark.sql.execution.arrow.maxRecordsPerBatch, and feature
extraction is one mapInPandas pass writing a narrow features table.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, duration_ms:int>"
)

FEATURES_SCHEMA = "media_id bigint, kind string, dim int, features array<float>"


def make_media_table(spark, documents: DataFrame, kind: str = "image") -> DataFrame:
    """Wrap a text table into a synthetic media table (payload = utf-8 bytes)
    so the binary plumbing can be tested without real media."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.length("text") * 10).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real encoder: blake2b-seeded values."""
    out = np.empty(dim, dtype=np.float32)
    for i in range(0, dim, 8):
        h = hashlib.blake2b(payload + i.to_bytes(4, "big"), digest_size=32).digest()
        chunk = np.frombuffer(h, dtype=np.uint32).astype(np.float32) / 2**32
        out[i : i + 8] = chunk[: min(8, dim - i)]
    return out


def decode_media(
    media: DataFrame, dim: int = 16, fake: bool = True
) -> DataFrame:
    """media table -> (media_id, kind, dim, features array<float>).

    fake=False is the real-codec slot (PIL/torchaudio/ffmpeg) — deliberately
    NotImplemented in this container."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decoding requires codec libraries not present "
                    "in this environment; pass fake=True for the test path"
                )
            feats = [
                _fake_features(bytes(p), dim).tolist() for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "dim": dim,
                    "features": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        gen, schema=FEATURES_SCHEMA
    )


def resize_media(
    media: DataFrame, width: int = 32, height: int = 32, fake: bool = True
) -> DataFrame:
    """Resize plumbing: same schema out as in, meta updated to the target
    dims.  fake=True passes payload bytes through (deterministic stand-in);
    fake=False is the real-resampler slot (PIL/ffmpeg), NotImplemented here.
    The Spark shape is what matters at scale: one mapInPandas pass, binary in
    / binary out, metadata maintained columnar-side."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real resizing requires codec libraries not present in "
                    "this environment; pass fake=True for the test path"
                )
            yield pdf

    resized = media.select("media_id", "kind", "payload").mapInPandas(
        gen, schema="media_id bigint, kind string, payload binary"
    )
    return resized.join(media.select("media_id", "meta"), "media_id").select(
        "media_id",
        "kind",
        "payload",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.sample_rate").alias("sample_rate"),
            F.col("meta.duration_ms").alias("duration_ms"),
        ).alias("meta"),
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Pure-SQL frame sampling plan for video rows: explode the timestamp
    grid from meta.duration_ms — the decode of each frame would be another
    mapInPandas over (media_id, frame_ts)."""
    return media.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0), F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)), F.lit(every_ms)
            )
        ).alias("frame_ts"),
    )
