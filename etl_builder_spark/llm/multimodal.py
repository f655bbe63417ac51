"""Multimodal columns (task mandate: image/audio/video as opaque
binary + typed metadata; decode / feature-extract / resize /
frame-sample as Arrow-batched pandas functions over mapInPandas).

The image/audio codec libraries are not in this container, so the
DECODE step is stubbed: ``decode_image`` raises NotImplementedError
unless ``fake=True``, in which case a deterministic fake decoder
(seeded by the content hash) produces stable pseudo-pixels. Everything
around the stub — the binary column representation, the metadata
struct, the mapInPandas batch plumbing, partitioning, and output
schemas — is real and tested (tests/test_multimodal.py).

100 TB posture: binaries stay opaque through the relational layers
(never SELECT them unless the operator consumes bytes — column
pruning keeps them on disk); decode work is mapInPandas so each task
streams Arrow batches without driver involvement; frame sampling
emits rows (one per frame) so downstream is ordinary relational.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: canonical multimodal asset schema: opaque payload + typed metadata
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),  # image|audio|video
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("codec", StringType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("content_sha", StringType()),
        StructField("features", ArrayType(FloatType())),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_sha", StringType()),
    ]
)


def synthetic_assets(spark: SparkSession, sf_dir: str, media_type: str = "image") -> DataFrame:
    """Derive a deterministic binary-asset table from the documents
    corpus (no binary fixture exists): payload = utf-8 text bytes,
    metadata derived from doc fields. Exercises BinaryType end-to-end."""
    from etl_builder_spark.session import load_table

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").alias("asset_id"),
        F.lit(media_type).alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        (F.col("n_chars") % 640 + 1).cast("int").alias("width"),
        (F.col("n_chars") % 480 + 1).cast("int").alias("height"),
        (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
        F.lit("synthetic/v1").alias("codec"),
    )


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic fake decoder: features seeded by content hash —
    stable across runs/executors, stands in for a real codec."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big") % (2**32)
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


def decode_image(payload: bytes, fake: bool = False, dim: int = 16) -> np.ndarray:
    """STUB: real image decode needs PIL/libjpeg — not in this
    container. The Spark-side plumbing calls this per payload."""
    if not fake:
        raise NotImplementedError(
            "image codecs unavailable in this environment; pass fake=True "
            "for the deterministic stand-in decoder"
        )
    return _fake_decode(payload, dim)


def decode_features(assets: DataFrame, dim: int = 16, fake: bool = True) -> DataFrame:
    """mapInPandas decode: payload → feature vector + content hash.
    Arrow streams batches into Python; one task per input partition."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "content_sha": pdf["payload"].map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "features": pdf["payload"].map(
                        lambda b: decode_image(bytes(b), fake=fake, dim=dim).tolist()
                    ),
                }
            )

    return assets.mapInPandas(decode_batches, DECODED_SCHEMA)


def sample_frames(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling: one output row per sampled frame (row-explosion
    happens in Python per batch, schema stays relational)."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, shas = [], [], []
            for _, row in pdf.iterrows():
                n = max(int(row["duration_ms"]) // every_ms, 1)
                payload = bytes(row["payload"])
                for i in range(n):
                    ids.append(row["asset_id"])
                    idxs.append(i)
                    shas.append(hashlib.sha256(payload + i.to_bytes(4, "big")).hexdigest()[:16])
            yield pd.DataFrame({"asset_id": ids, "frame_idx": idxs, "frame_sha": shas})

    return assets.select("asset_id", "duration_ms", "payload").mapInPandas(frames, FRAME_SCHEMA)


def resize_meta(assets: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning is pure column math (JVM-side): compute target
    dims preserving aspect ratio; actual pixel work would live in the
    decode UDF."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest("width", "height").cast("double"),
    )
    return assets.select(
        "asset_id",
        "width",
        "height",
        F.round(scale, 6).alias("scale"),
        F.greatest((F.col("width") * scale).cast("int"), F.lit(1)).alias("target_w"),
        F.greatest((F.col("height") * scale).cast("int"), F.lit(1)).alias("target_h"),
    )
