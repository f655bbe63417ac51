"""Multimodal columns (task mandate: image/audio/video as opaque
binary + typed metadata; decode / feature-extract / resize /
frame-sample as Arrow-batched pandas functions over mapInPandas).

DECODE is REAL for formats parseable with numpy alone — PPM (P6),
24-bit BMP, PCM-16 WAV (llm/codecs.py, pure numpy, golden-byte
tested). Formats that need codec libraries absent from this container
(JPEG/PNG/MP3) raise ``UnsupportedCodecError``; ``fake=True`` keeps
the round-1 deterministic stand-in for payloads that are not real
media (e.g. text bytes used as plumbing fixtures).

The declared query ``multimodal_decode_meta`` proves the decode path
end-to-end against an EXACT SQL oracle: encode deterministic
constant-color P6 images (dims and channel values are closed-form in
doc_id), decode the actual bytes back, and check parsed dims / channel
means / byte counts against the closed form.

100 TB posture: binaries stay opaque through the relational layers
(never SELECT them unless the operator consumes bytes — column
pruning keeps them on disk); decode work is mapInPandas so each task
streams Arrow batches without driver involvement; frame sampling
emits rows (one per frame) so downstream is ordinary relational.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_builder_spark.registry import register
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
    """Decode an image payload to a feature vector.

    Real path: PPM (P6) and 24-bit BMP parse via the pure-numpy codecs
    (llm/codecs.py) and featurize with ``image_features`` (16-dim).
    JPEG/PNG would need libjpeg/libpng — absent here — so unknown
    formats raise ``UnsupportedCodecError`` (a NotImplementedError)
    unless ``fake=True``, which substitutes the deterministic
    content-hash-seeded stand-in (for non-media plumbing fixtures)."""
    from etl_builder_spark.llm.codecs import UnsupportedCodecError, decode_image_pixels, image_features

    try:
        pixels = decode_image_pixels(payload)
    except UnsupportedCodecError:
        if fake:
            return _fake_decode(payload, dim)
        raise
    feats = image_features(pixels)
    return feats[:dim] if dim <= len(feats) else np.pad(feats, (0, dim - len(feats)))


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


def synthetic_ppm_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image payloads: one constant-color P6 PPM per document,
    dims and channel values closed-form in doc_id (so decode output is
    exactly predictable). Encode runs in mapInPandas — at scale this is
    the same Arrow-batched seam any ingest-side transcoder would use."""
    from etl_builder_spark.llm.codecs import encode_ppm
    from etl_builder_spark.session import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id")

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = did % 16 + 1, did % 8 + 1
                px = np.zeros((h, w, 3), dtype=np.uint8)
                px[:, :, 0] = (did * 7) % 256
                px[:, :, 1] = (did * 13) % 256
                px[:, :, 2] = (did * 29) % 256
                payloads.append(encode_ppm(px))
            yield pd.DataFrame({"asset_id": pdf["doc_id"], "payload": payloads})

    return d.mapInPandas(encode, "asset_id long, payload binary")


@register(
    "multimodal_decode_meta",
    oracle="""
        SELECT doc_id AS asset_id,
               CAST(doc_id % 16 + 1 AS INTEGER) AS width,
               CAST(doc_id % 8 + 1 AS INTEGER) AS height,
               (doc_id % 16 + 1) * (doc_id % 8 + 1) AS n_pixels,
               CAST((doc_id * 7) % 256 AS DOUBLE) AS mean_r,
               CAST((doc_id * 13) % 256 AS DOUBLE) AS mean_g,
               CAST((doc_id * 29) % 256 AS DOUBLE) AS mean_b,
               length(concat('P6', chr(10),
                             CAST(doc_id % 16 + 1 AS VARCHAR), ' ',
                             CAST(doc_id % 8 + 1 AS VARCHAR), chr(10),
                             '255', chr(10)))
                   + 3 * (doc_id % 16 + 1) * (doc_id % 8 + 1) AS n_bytes
        FROM documents
    """,
    tags=("I9", "multimodal"),
)
def multimodal_decode_meta(spark, sf_dir):
    """End-to-end REAL decode check: encode one deterministic
    constant-color PPM per document, then parse the actual bytes back
    (header tokenizer + raster) and report dims / channel means /
    payload size. The oracle states the same values in closed form —
    if the byte-level encode or decode drifts by even one byte,
    n_bytes or the means diverge."""
    from etl_builder_spark.llm.codecs import decode_ppm

    assets = synthetic_ppm_assets(spark, sf_dir)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("asset_id", "width", "height", "n_pixels",
                                   "mean_r", "mean_g", "mean_b", "n_bytes")}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                data = bytes(payload)
                px = decode_ppm(data)
                h, w = px.shape[:2]
                out["asset_id"].append(int(aid))
                out["width"].append(w)
                out["height"].append(h)
                out["n_pixels"].append(w * h)
                out["mean_r"].append(float(px[:, :, 0].mean()))
                out["mean_g"].append(float(px[:, :, 1].mean()))
                out["mean_b"].append(float(px[:, :, 2].mean()))
                out["n_bytes"].append(len(data))
            yield pd.DataFrame(out)

    return assets.mapInPandas(
        decode,
        "asset_id long, width int, height int, n_pixels long, "
        "mean_r double, mean_g double, mean_b double, n_bytes long",
    )


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


@register(
    "multimodal_frame_sample",
    oracle="""
        WITH expanded AS (
            -- COALESCE(n_chars, length(text)) (r12 nullmeasures): the
            -- asset duration derives from the text when the metadata
            -- column is missing, keeping the frame count defined
            SELECT doc_id AS asset_id, text,
                   unnest(generate_series(
                       0, CAST(greatest(
                              (COALESCE(n_chars, length(text)) * 10) // 1000, 1
                          ) AS BIGINT) - 1
                   )) AS frame_idx
            FROM documents
        )
        SELECT asset_id,
               CAST(frame_idx AS INT) AS frame_idx,
               substr(sha256(text || '#' || CAST(frame_idx AS VARCHAR)), 1, 16)
                   AS frame_sha
        FROM expanded
    """,
    tags=("I-frames",),
)
def multimodal_frame_sample(spark, sf_dir):
    """Frame sampling as a DECLARED, exact-hashed key: one row per
    sampled 1-second frame of each synthetic video asset (duration =
    n_chars×10 ms, ≥ 1 frame), fingerprinted per frame — the video →
    relational-rows seam of a multimodal pipeline, executed as an
    Arrow-batched ``mapInPandas`` (the real frame decoder slots into
    the same batch loop; see sample_frames/decode_image for the codec
    path and its UnsupportedCodecError stub policy).

    The fingerprint recipe is deliberately ASCII-composable —
    sha256(utf8(text) ‖ '#' ‖ str(idx)) — so the DuckDB oracle
    reproduces it in SQL and the whole UDF seam (batch iteration, row
    explosion in Python, Arrow schema) sits under the exact hash, not
    just a rows-only count.  Row explosion happens inside the workers
    (no driver involvement, no shuffle); output partitioning inherits
    the input's, so a downstream per-asset groupBy is the only
    exchange a consumer pays."""
    from etl_builder_spark.session import load_table

    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("asset_id"),
        "text",
        # derive duration from the text when n_chars is NULL (r12)
        (F.coalesce(F.col("n_chars"), F.length("text")) * 10)
        .cast("long")
        .alias("duration_ms"),
    )

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, shas = [], [], []
            for _, row in pdf.iterrows():
                n = max(int(row["duration_ms"]) // 1000, 1)
                text = row["text"]
                for i in range(n):
                    ids.append(row["asset_id"])
                    idxs.append(i)
                    shas.append(
                        hashlib.sha256(f"{text}#{i}".encode()).hexdigest()[:16]
                    )
            yield pd.DataFrame({"asset_id": ids, "frame_idx": idxs, "frame_sha": shas})

    return d.mapInPandas(frames, FRAME_SCHEMA)


@register(
    "multimodal_audio_stats",
    oracle="""
        WITH base AS (
            SELECT doc_id, doc_id % 4000 + 100 AS n FROM (SELECT DISTINCT doc_id FROM documents) documents
        ),
        vals AS (
            SELECT doc_id, n,
                   ((doc_id * 31 + i * 17) % 65536) - 32768 AS s
            FROM base, unnest(range(0, n)) AS u(i)
        )
        SELECT doc_id AS asset_id,
               n AS n_samples,
               CAST(8000 AS INT) AS rate,
               CAST(n AS DOUBLE) * 1000.0 / 8000.0 AS duration_ms,
               MAX(abs(s)) AS peak,
               sqrt(CAST(SUM(s * s) AS DOUBLE) / n) / 32768.0 AS rms
        FROM vals
        GROUP BY doc_id, n
    """,
    tags=("I-audio",),
)
def multimodal_audio_stats(spark, sf_dir):
    """Audio ingest stats through a REAL PCM-16 RIFF/WAV round trip:
    per-document payloads are synthesized from a closed-form integer
    sample pattern (s_i = ((id·31 + i·17) mod 65536) − 32768), encoded
    with the pure-numpy WAV writer, decoded back by the WAV parser,
    and summarized (sample count, duration, peak, RMS).  Because the
    pattern is integer-exact, the DuckDB oracle recomputes every
    statistic symbolically — hash equality proves the codec round
    trip is lossless END-TO-END, not just the arithmetic.  RMS is an
    exact-integer sum of squares followed by identical IEEE
    divide/sqrt on both engines, so no rounding is needed (policy
    §7.2: floats only drift when accumulation order can differ).

    100 TB posture: the same Arrow mapInPandas seam as the image path
    (multimodal_decode_meta) — payload bytes never leave the executor,
    Python sees columnar batches, output is flat relational rows; a
    real audio pipeline swaps the synthesizer for object-store reads
    and the stats for a feature extractor (audio_features) without
    touching the Spark plumbing."""
    from etl_builder_spark.llm.codecs import decode_wav, encode_wav
    from etl_builder_spark.session import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id").distinct()

    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("asset_id", "n_samples", "rate", "duration_ms", "peak", "rms")}
            for did in pdf["doc_id"]:
                did = int(did)
                n = did % 4000 + 100
                i = np.arange(n, dtype=np.int64)
                s = ((did * 31 + i * 17) % 65536) - 32768
                payload = encode_wav(s.astype(np.int16), rate=8000)
                dec, rate = decode_wav(payload)
                dec = dec.astype(np.int64)
                sum_sq = int((dec * dec).sum())
                out["asset_id"].append(did)
                out["n_samples"].append(len(dec))
                out["rate"].append(rate)
                out["duration_ms"].append(float(len(dec)) * 1000.0 / rate)
                out["peak"].append(int(np.abs(dec).max()))
                out["rms"].append(math.sqrt(sum_sq / len(dec)) / 32768.0)
            yield pd.DataFrame(out)

    schema = "asset_id long, n_samples long, rate int, duration_ms double, peak long, rms double"
    return d.mapInPandas(roundtrip, schema)


@register(
    "multimodal_bmp_decode",
    oracle="""
        SELECT doc_id AS asset_id,
               CAST(doc_id % 8 + 1 AS INT) AS width,
               CAST(doc_id % 4 + 1 AS INT) AS height,
               CAST(doc_id * 11 % 256 AS BIGINT) AS mean_r,
               CAST(doc_id * 17 % 256 AS BIGINT) AS mean_g,
               CAST(doc_id * 23 % 256 AS BIGINT) AS mean_b,
               CAST((doc_id % 8 + 1) * (doc_id % 4 + 1) * 3 + 54
                    + ((4 - ((doc_id % 8 + 1) * 3) % 4) % 4) * (doc_id % 4 + 1)
                    AS BIGINT) AS n_bytes
        FROM documents
    """,
    tags=("I-bmp",),
)
def multimodal_bmp_decode(spark, sf_dir):
    """24-bit BMP round trip — the second real image codec (the PPM
    path is multimodal_decode_meta): constant-color payloads with
    dims/channels closed-form in doc_id are ENCODED by the pure-numpy
    BMP writer (BITMAPINFOHEADER, bottom-up rows, BGR order, 4-byte
    row padding) and DECODED back inside mapInPandas; the emitted
    stats — dims, exact per-channel means, and the container byte
    size INCLUDING the header and row padding — are all predicted
    symbolically by the oracle, so hash equality proves the format
    round trip (padding math and channel order included) is lossless.

    100 TB posture: identical Arrow seam as the other codecs —
    payloads never leave executors, Python sees columnar batches; the
    padding-size check matters operationally (it is the on-disk
    bytes-per-asset a capacity plan multiplies out)."""
    from etl_builder_spark.llm.codecs import decode_bmp, encode_bmp
    from etl_builder_spark.session import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id")

    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("asset_id", "width", "height", "mean_r", "mean_g", "mean_b", "n_bytes")
        for pdf in batches:
            out = {k: [] for k in cols}
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = did % 8 + 1, did % 4 + 1
                px = np.zeros((h, w, 3), dtype=np.uint8)
                px[:, :, 0] = (did * 11) % 256
                px[:, :, 1] = (did * 17) % 256
                px[:, :, 2] = (did * 23) % 256
                payload = encode_bmp(px)
                dec = decode_bmp(payload).astype(np.int64)
                n = dec.shape[0] * dec.shape[1]
                out["asset_id"].append(did)
                out["width"].append(dec.shape[1])
                out["height"].append(dec.shape[0])
                out["mean_r"].append(int(dec[:, :, 0].sum()) // n)
                out["mean_g"].append(int(dec[:, :, 1].sum()) // n)
                out["mean_b"].append(int(dec[:, :, 2].sum()) // n)
                out["n_bytes"].append(len(payload))
            yield pd.DataFrame(out)

    schema = (
        "asset_id long, width int, height int, "
        "mean_r long, mean_g long, mean_b long, n_bytes long"
    )
    return d.mapInPandas(roundtrip, schema)


@register(
    "dedup_frame_fingerprints",
    oracle="""
        WITH base AS (
            -- COALESCE (r12): duration derives from the text when the
            -- metadata column is NULL (see multimodal_frame_sample)
            SELECT doc_id, text,
                   COALESCE(n_chars, length(text)) * 10 AS duration_ms
            FROM documents WHERE doc_id < 100
        ),
        assets AS (
            SELECT doc_id AS asset_id, text, duration_ms FROM base
            UNION ALL
            SELECT doc_id + 1000000, text, duration_ms // 2 FROM base
        ),
        frames AS (
            SELECT asset_id,
                   substr(sha256(text || '#' || CAST(i AS VARCHAR)), 1, 16) AS fp
            FROM assets,
                 unnest(generate_series(
                     0, CAST(greatest(duration_ms // 1000, 1) AS BIGINT) - 1)) AS t(i)
        ),
        sizes AS (SELECT asset_id, COUNT(*) AS nf FROM frames GROUP BY asset_id),
        pairs AS (
            SELECT a.asset_id AS asset_a, b.asset_id AS asset_b,
                   COUNT(*) AS n_shared
            FROM frames a JOIN frames b
              ON a.fp = b.fp AND a.asset_id < b.asset_id
            GROUP BY 1, 2
        )
        SELECT asset_a, asset_b, n_shared,
               ROUND(CAST(n_shared AS DOUBLE) / least(sa.nf, sb.nf), 6)
                   AS overlap_frac
        FROM pairs
        JOIN sizes sa ON sa.asset_id = asset_a
        JOIN sizes sb ON sb.asset_id = asset_b
        WHERE CAST(n_shared AS DOUBLE) / least(sa.nf, sb.nf) >= 0.5
    """,
    tags=("I-frame-dedup",),
)
def dedup_frame_fingerprints(spark, sf_dir):
    """Video-style near-duplicate detection by FRAME fingerprints: two
    assets are near-dups when they share ≥50% of the shorter asset's
    sampled-frame hashes — the standard re-upload / clipped-copy
    detector (whole-file hashing misses a truncated re-encode; frame
    overlap catches it).  The fixture plants a half-duration clip of
    every asset (same content, duration halved), which must pair with
    its original at overlap 1.0 of the shorter side.

    Scale shape: the frame table is an inverted fingerprint index —
    candidates come from an EQUI-join on the hash, bounded per
    fingerprint by its asset-frequency (a boilerplate intro frame
    shared by thousands of assets is the df-ceiling case,
    llm/dedup.DF_CEILING applies verbatim) — never an asset×asset
    comparison.  Frames explode inside mapInPandas (the real decoder
    seam, multimodal_frame_sample); everything after is two hash
    joins on the persisted frame/size frames."""
    from etl_builder_spark.session import load_table

    base = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 100)
        .select(
            F.col("doc_id").alias("asset_id"),
            "text",
            # derive duration when n_chars is NULL (r12)
            (F.coalesce(F.col("n_chars"), F.length("text")) * 10)
            .cast("long")
            .alias("duration_ms"),
        )
    )
    assets = base.unionByName(
        base.select(
            (F.col("asset_id") + 1_000_000).alias("asset_id"),
            "text",
            (F.col("duration_ms") / 2).cast("long").alias("duration_ms"),
        )
    )

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps = [], []
            for _, row in pdf.iterrows():
                n = max(int(row["duration_ms"]) // 1000, 1)
                text = row["text"]
                for i in range(n):
                    ids.append(row["asset_id"])
                    fps.append(hashlib.sha256(f"{text}#{i}".encode()).hexdigest()[:16])
            yield pd.DataFrame({"asset_id": ids, "fp": fps})

    fr = assets.mapInPandas(frames, "asset_id long, fp string").persist()
    sizes = fr.groupBy("asset_id").agg(F.count(F.lit(1)).alias("nf"))
    a, b = fr.alias("a"), fr.alias("b")
    pairs = (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.asset_id") < F.col("b.asset_id")))
        .groupBy(
            F.col("a.asset_id").alias("asset_a"), F.col("b.asset_id").alias("asset_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    frac = F.col("n_shared").cast("double") / F.least(F.col("sa.nf"), F.col("sb.nf"))
    return (
        pairs.join(sa, F.col("sa.asset_id") == F.col("asset_a"))
        .join(sb, F.col("sb.asset_id") == F.col("asset_b"))
        .where(frac >= 0.5)
        .select("asset_a", "asset_b", "n_shared", F.round(frac, 6).alias("overlap_frac"))
    )


@register(
    "multimodal_resize_halve",
    oracle="""
        WITH base AS (
            SELECT doc_id,
                   (doc_id % 6 + 2) * 2 AS w,
                   (doc_id % 3 + 1) * 2 AS h
            FROM (SELECT DISTINCT doc_id FROM documents) documents WHERE doc_id < 200
        ),
        cells AS (
            SELECT doc_id, w, h, r2.i AS r2, c2.i AS c2, ch.i AS ch,
                   ((doc_id * 7 + (r2.i * 2) * 31 + (c2.i * 2) * 13 + ch.i * 97) % 256
                    + (doc_id * 7 + (r2.i * 2) * 31 + (c2.i * 2 + 1) * 13 + ch.i * 97) % 256
                    + (doc_id * 7 + (r2.i * 2 + 1) * 31 + (c2.i * 2) * 13 + ch.i * 97) % 256
                    + (doc_id * 7 + (r2.i * 2 + 1) * 31 + (c2.i * 2 + 1) * 13 + ch.i * 97) % 256
                   ) // 4 AS v
            FROM base,
                 unnest(range(0, h // 2)) AS r2(i),
                 unnest(range(0, w // 2)) AS c2(i),
                 unnest(range(0, 3)) AS ch(i)
        )
        SELECT doc_id AS asset_id,
               CAST(MIN(w) // 2 AS INT) AS out_w,
               CAST(MIN(h) // 2 AS INT) AS out_h,
               CAST(SUM(v) AS BIGINT) AS pixel_sum,
               CAST(MAX(CASE WHEN r2 = 0 AND c2 = 0 AND ch = 0 THEN v END)
                    AS BIGINT) AS corner_r
        FROM cells GROUP BY doc_id
    """,
    tags=("I-resize",),
)
def multimodal_resize_halve(spark, sf_dir):
    """REAL image resizing — 2× downsample by exact 2×2 block-mean
    (floor) — run through the ACTUAL codec path: a gradient test
    pattern (pixel = (id·7 + r·31 + c·13 + ch·97) mod 256, so every
    pixel differs) is PPM-ENCODED, DECODED back, resized in numpy,
    and summarized (output dims, exact pixel sum, corner value); the
    oracle recomputes the resized pixels symbolically, so hash
    equality proves encode → decode → block-mean arithmetic
    end-to-end on non-trivial pixel data.  This replaces the survey's
    resize-as-metadata stub (resize_meta) with the computation
    itself — integer-exact, so no codec-library float resampling
    semantics are smuggled in.

    100 TB posture: the same Arrow mapInPandas seam as every codec
    operator; resize is embarrassingly parallel per asset, pixels
    never leave the executor, and the relational output is the typed
    summary a curation pipeline actually stores (thumbnails
    themselves would be written back as binary columns through the
    identical seam)."""
    from etl_builder_spark.llm.codecs import decode_ppm, encode_ppm
    from etl_builder_spark.session import load_table

    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200).select("doc_id").distinct()

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("asset_id", "out_w", "out_h", "pixel_sum", "corner_r")
        for pdf in batches:
            out = {k: [] for k in cols}
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = (did % 6 + 2) * 2, (did % 3 + 1) * 2
                r = np.arange(h)[:, None, None]
                c = np.arange(w)[None, :, None]
                ch = np.arange(3)[None, None, :]
                px = ((did * 7 + r * 31 + c * 13 + ch * 97) % 256).astype(np.uint8)
                dec = decode_ppm(encode_ppm(px)).astype(np.int64)
                blocks = dec.reshape(h // 2, 2, w // 2, 2, 3)
                resized = blocks.sum(axis=(1, 3)) // 4
                out["asset_id"].append(did)
                out["out_w"].append(w // 2)
                out["out_h"].append(h // 2)
                out["pixel_sum"].append(int(resized.sum()))
                out["corner_r"].append(int(resized[0, 0, 0]))
            yield pd.DataFrame(out)

    return d.mapInPandas(
        work, "asset_id long, out_w int, out_h int, pixel_sum long, corner_r long"
    )


@register(
    "multimodal_audio_downsample_2x",
    oracle="""
        WITH base AS (
            SELECT doc_id, doc_id % 4000 + 100 AS n FROM (SELECT DISTINCT doc_id FROM documents) documents
        ),
        outs AS (
            SELECT doc_id, n,
                   CAST(FLOOR((((((doc_id * 31 + (2 * j) * 17) % 65536) - 32768)
                               + (((doc_id * 31 + (2 * j + 1) * 17) % 65536) - 32768))
                              ) / 2.0) AS BIGINT) AS o
            FROM base, unnest(range(0, n // 2)) AS u(j)
        )
        SELECT doc_id AS asset_id,
               n AS n_in,
               n // 2 AS n_out,
               CAST(4000 AS INT) AS rate_out,
               MAX(abs(o)) AS peak_out,
               CAST(SUM(o) AS BIGINT) AS sum_out,
               sqrt(CAST(SUM(o * o) AS DOUBLE) / (n // 2)) / 32768.0 AS rms_out
        FROM outs GROUP BY doc_id, n
    """,
    tags=("I-audio-downsample",),
)
def multimodal_audio_downsample_2x(spark, sf_dir):
    """Real 2× audio decimation through the PCM-16 WAV codec — the
    audio sibling of multimodal_resize_halve's block-mean image
    resize: synthesize the closed-form sample pattern, ENCODE to
    RIFF/WAV at 8 kHz, DECODE, average adjacent sample pairs
    (floor((s₂ⱼ+s₂ⱼ₊₁)/2) — the box-filter anti-alias + decimate),
    RE-ENCODE the result at 4 kHz, decode once more, and emit stats
    computed from that SECOND decode.  The oracle predicts every
    value symbolically from the pattern, so hash equality proves two
    full codec round trips AND the decimation arithmetic are
    lossless; pair means floor through float division, identical on
    both engines, and stay in int16 range by construction.

    100 TB posture: same Arrow mapInPandas seam as every codec key —
    payload bytes live and die inside the executor task, output is
    flat relational rows; a production resampler swaps the box filter
    for a windowed-sinc kernel in the same batch loop (numpy
    convolution over the decoded block) with zero change to the
    Spark plumbing or partitioning."""
    from etl_builder_spark.llm.codecs import decode_wav, encode_wav
    from etl_builder_spark.session import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id").distinct()

    def downsample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                k: []
                for k in (
                    "asset_id", "n_in", "n_out", "rate_out", "peak_out", "sum_out", "rms_out"
                )
            }
            for did in pdf["doc_id"]:
                did = int(did)
                n = did % 4000 + 100
                i = np.arange(n, dtype=np.int64)
                s = ((did * 31 + i * 17) % 65536) - 32768
                dec, rate = decode_wav(encode_wav(s.astype(np.int16), rate=8000))
                dec = dec.astype(np.int64)
                n_out = n // 2
                pairs = dec[: n_out * 2].reshape(n_out, 2)
                ds = np.floor((pairs[:, 0] + pairs[:, 1]) / 2.0).astype(np.int64)
                dec2, rate2 = decode_wav(encode_wav(ds.astype(np.int16), rate=4000))
                dec2 = dec2.astype(np.int64)
                sum_sq = int((dec2 * dec2).sum())
                out["asset_id"].append(did)
                out["n_in"].append(n)
                out["n_out"].append(len(dec2))
                out["rate_out"].append(rate2)
                out["peak_out"].append(int(np.abs(dec2).max()))
                out["sum_out"].append(int(dec2.sum()))
                out["rms_out"].append(math.sqrt(sum_sq / len(dec2)) / 32768.0)
            yield pd.DataFrame(out)

    schema = (
        "asset_id long, n_in long, n_out long, rate_out int, "
        "peak_out long, sum_out long, rms_out double"
    )
    return d.mapInPandas(downsample, schema)


@register(
    "multimodal_audio_normalize_peak",
    oracle="""
        WITH base AS (
            SELECT doc_id, doc_id % 4000 + 100 AS n FROM (SELECT DISTINCT doc_id FROM documents) documents
            WHERE doc_id < 500
        ),
        vals AS (
            SELECT doc_id, n,
                   ((doc_id * 31 + i * 17) % 65536) - 32768 AS s
            FROM base, unnest(range(0, n)) AS u(i)
        ),
        pk AS (
            SELECT doc_id, n, MAX(abs(s)) AS peak FROM vals GROUP BY 1, 2
        ),
        g AS (
            SELECT doc_id, n, peak,
                   FLOOR(32767.0 * 1000 / peak) / 1000 AS gain
            FROM pk
        ),
        norm AS (
            SELECT v.doc_id, g.n, g.gain,
                   GREATEST(-32768, LEAST(32767,
                       CAST(FLOOR(v.s * g.gain + 0.5) AS BIGINT))) AS ns,
                   CASE WHEN CAST(FLOOR(v.s * g.gain + 0.5) AS BIGINT) > 32767
                          OR CAST(FLOOR(v.s * g.gain + 0.5) AS BIGINT) < -32768
                        THEN 1 ELSE 0 END AS clipped
            FROM vals v JOIN g ON g.doc_id = v.doc_id
        )
        SELECT doc_id AS asset_id,
               CAST(n AS BIGINT) AS n_samples,
               gain,
               CAST(MAX(abs(ns)) AS BIGINT) AS new_peak,
               CAST(SUM(clipped) AS BIGINT) AS n_clipped,
               sqrt(CAST(SUM(ns * ns) AS DOUBLE) / n) / 32768.0 AS new_rms
        FROM norm
        GROUP BY doc_id, n, gain
    """,
    tags=("I-audio-normalize",),
)
def multimodal_audio_normalize_peak(spark, sf_dir):
    """Peak normalization through TWO real WAV codec round trips (the
    multimodal_audio_downsample_2x shape): decode the synthesized
    clip, compute the 3-dp-floored gain 32767/peak, rescale samples
    with the symmetric round-half-up ``floor(s*gain + 0.5)`` and clip
    to int16 range, re-encode, decode again, and report the new peak /
    clipped-sample count / RMS — the loudness-leveling step of every
    audio ingest pipeline, proven lossless end-to-end because the
    DuckDB oracle recomputes the whole chain symbolically from the
    closed-form sample pattern.

    Determinism: peak and the clip census are exact integers; gain is
    a 3-dp floor of an integer ratio; ``floor(s*gain + 0.5)`` on the
    double product is the same IEEE expression in numpy and DuckDB
    (banker's-rounding np.round is deliberately NOT used); RMS divides
    an exact integer sum of squares.

    100 TB posture: same Arrow mapInPandas seam as the whole
    multimodal family — two decode passes per payload inside one
    executor task, no payload bytes in the shuffle, output flat
    relational rows."""
    from etl_builder_spark.llm.codecs import decode_wav, encode_wav
    from etl_builder_spark.session import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id").distinct().where(
        F.col("doc_id") < 500
    )

    def normalize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                k: []
                for k in (
                    "asset_id",
                    "n_samples",
                    "gain",
                    "new_peak",
                    "n_clipped",
                    "new_rms",
                )
            }
            for did in pdf["doc_id"]:
                did = int(did)
                n = did % 4000 + 100
                i = np.arange(n, dtype=np.int64)
                s = ((did * 31 + i * 17) % 65536) - 32768
                payload = encode_wav(s.astype(np.int16), rate=8000)
                dec, rate = decode_wav(payload)
                dec = dec.astype(np.int64)
                peak = int(np.abs(dec).max())
                gain = math.floor(32767.0 * 1000 / peak) / 1000
                raw = np.floor(dec * gain + 0.5).astype(np.int64)
                clipped = int(((raw > 32767) | (raw < -32768)).sum())
                ns = np.clip(raw, -32768, 32767)
                payload2 = encode_wav(ns.astype(np.int16), rate=rate)
                dec2, _ = decode_wav(payload2)
                dec2 = dec2.astype(np.int64)
                out["asset_id"].append(did)
                out["n_samples"].append(len(dec2))
                out["gain"].append(gain)
                out["new_peak"].append(int(np.abs(dec2).max()))
                out["n_clipped"].append(clipped)
                out["new_rms"].append(
                    math.sqrt(int((dec2 * dec2).sum()) / len(dec2)) / 32768.0
                )
            yield pd.DataFrame(out)

    schema = (
        "asset_id long, n_samples long, gain double, new_peak long,"
        " n_clipped long, new_rms double"
    )
    return d.mapInPandas(normalize, schema)


@register(
    "multimodal_image_patches",
    oracle="""
        WITH base AS (
            SELECT doc_id,
                   (doc_id % 6 + 2) * 2 AS w,
                   (doc_id % 3 + 1) * 2 AS h
            FROM (SELECT DISTINCT doc_id FROM documents) documents WHERE doc_id < 200
        ),
        px AS (
            SELECT doc_id, w, h,
                   r.i // 2 AS pr, c.i // 2 AS pc, ch.i AS ch,
                   (doc_id * 7 + r.i * 31 + c.i * 13 + ch.i * 97) % 256 AS v
            FROM base,
                 unnest(range(0, h)) AS r(i),
                 unnest(range(0, w)) AS c(i),
                 unnest(range(0, 3)) AS ch(i)
        )
        SELECT doc_id AS asset_id,
               CAST(pr AS INT) AS patch_row,
               CAST(pc AS INT) AS patch_col,
               CAST(SUM(CASE WHEN ch = 0 THEN v ELSE 0 END) // 4 AS BIGINT) AS mean_r,
               CAST(SUM(CASE WHEN ch = 1 THEN v ELSE 0 END) // 4 AS BIGINT) AS mean_g,
               CAST(SUM(CASE WHEN ch = 2 THEN v ELSE 0 END) // 4 AS BIGINT) AS mean_b,
               CAST(SUM(v) AS BIGINT) AS patch_sum
        FROM px
        GROUP BY doc_id, pr, pc
    """,
    tags=("I-patches",),
)
def multimodal_image_patches(spark, sf_dir):
    """ViT-style patch extraction through the REAL PPM codec path:
    each synthesized gradient image is encoded, decoded back, and cut
    into non-overlapping 2x2 patches; every patch emits its own
    relational row (per-channel floor-means + exact pixel sum) — the
    patchify step of every vision-transformer ingest, and the
    one-asset-to-many-rows explosion shape (multimodal_frame_sample's
    video analogue, for images).  The oracle recomputes every patch
    symbolically from the pixel formula, so hash equality proves the
    codec round trip AND the patch geometry (row-major patch indices,
    channel order) end-to-end.

    100 TB posture: one mapInPandas pass, patches per asset =
    (w/2)x(h/2) relational rows with pixel bytes never entering the
    shuffle; a real pipeline would widen the row with the flattened
    patch tensor (array<float>) feeding embed_normalize_quantize —
    the plumbing (Arrow batches, typed schema, per-asset fan-out) is
    exactly this."""
    from etl_builder_spark.llm.codecs import decode_ppm, encode_ppm
    from etl_builder_spark.session import load_table

    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200).select("doc_id").distinct()

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("asset_id", "patch_row", "patch_col", "mean_r", "mean_g", "mean_b", "patch_sum")
        for pdf in batches:
            out = {k: [] for k in cols}
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = (did % 6 + 2) * 2, (did % 3 + 1) * 2
                r = np.arange(h)[:, None, None]
                c = np.arange(w)[None, :, None]
                ch = np.arange(3)[None, None, :]
                px = ((did * 7 + r * 31 + c * 13 + ch * 97) % 256).astype(np.uint8)
                dec = decode_ppm(encode_ppm(px)).astype(np.int64)
                blocks = dec.reshape(h // 2, 2, w // 2, 2, 3)
                sums = blocks.sum(axis=(1, 3))  # (h/2, w/2, 3)
                for pr in range(h // 2):
                    for pc in range(w // 2):
                        out["asset_id"].append(did)
                        out["patch_row"].append(pr)
                        out["patch_col"].append(pc)
                        out["mean_r"].append(int(sums[pr, pc, 0]) // 4)
                        out["mean_g"].append(int(sums[pr, pc, 1]) // 4)
                        out["mean_b"].append(int(sums[pr, pc, 2]) // 4)
                        out["patch_sum"].append(int(sums[pr, pc].sum()))
            yield pd.DataFrame(out)

    return d.mapInPandas(
        work,
        "asset_id long, patch_row int, patch_col int,"
        " mean_r long, mean_g long, mean_b long, patch_sum long",
    )


@register(
    "dedup_binary_assets_md5",
    oracle="""
        WITH assets AS (
            SELECT doc_id, doc_id % 100 AS pattern_id
            FROM documents WHERE doc_id < 1000
        )
        SELECT pattern_id,
               CAST(MIN(doc_id) AS BIGINT) AS representative,
               CAST(COUNT(*) AS BIGINT) AS n_copies
        FROM assets
        GROUP BY pattern_id
    """,
    tags=("I-dedup-binary",),
)
def dedup_binary_assets_md5(spark, sf_dir):
    """Exact BINARY-asset dedup — the storage-dedup step for media
    corpora, and the one dedup modality the text/embedding family
    doesn't cover: every asset's payload (a REAL WAV encode of a
    sample pattern keyed by doc_id mod 100, so each pattern recurs
    ~10×) is hashed md5-over-bytes inside the Arrow seam, and assets
    group by digest with a min-id representative.

    The oracle knows nothing about WAV or md5 — it derives the
    expected clusters purely from the pattern arithmetic.  Hash
    equality therefore proves the strong claim: the codec is
    BYTE-DETERMINISTIC (same samples → same bytes, any executor, any
    batch shape), digests collide exactly on identical payloads, and
    the cluster census is complete.  The output's pattern_id is
    re-derived FROM the representative (not carried through), so a
    digest mismatch anywhere would scramble the grouping.

    100 TB posture: digest-per-asset is embarrassingly parallel in
    mapInPandas (bytes never shuffle — only 16-byte digests do), the
    cluster groupBy shuffles digests not payloads, and the same shape
    backs content-addressed storage and copy-on-ingest dedup at any
    asset size."""
    from etl_builder_spark.llm.codecs import encode_wav
    from etl_builder_spark.session import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 1000
    )

    def digest(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "md5_hex": []}
            for did in pdf["doc_id"]:
                did = int(did)
                pat = did % 100
                n = pat % 400 + 50
                i = np.arange(n, dtype=np.int64)
                s = ((pat * 31 + i * 17) % 65536) - 32768
                payload = encode_wav(s.astype(np.int16), rate=8000)
                out["doc_id"].append(did)
                out["md5_hex"].append(hashlib.md5(payload).hexdigest())
            yield pd.DataFrame(out)

    digests = d.mapInPandas(digest, "doc_id long, md5_hex string")
    return (
        digests.groupBy("md5_hex")
        .agg(
            F.min("doc_id").cast("bigint").alias("representative"),
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
        )
        .select(
            (F.col("representative") % 100).alias("pattern_id"),
            "representative",
            "n_copies",
        )
    )


@register(
    "multimodal_image_grayscale",
    oracle="""
        WITH base AS (
            SELECT doc_id,
                   doc_id % 6 + 3 AS w,
                   doc_id % 4 + 2 AS h
            FROM (SELECT DISTINCT doc_id FROM documents) documents WHERE doc_id < 300
        ),
        px AS (
            SELECT doc_id, w, h, r.i AS r, c.i AS c,
                   ((doc_id * 11 + r.i * 31 + c.i * 13) % 256 * 299
                    + (doc_id * 11 + r.i * 31 + c.i * 13 + 97) % 256 * 587
                    + (doc_id * 11 + r.i * 31 + c.i * 13 + 194) % 256 * 114
                   ) // 1000 AS g
            FROM base,
                 unnest(range(0, h)) AS r(i),
                 unnest(range(0, w)) AS c(i)
        )
        SELECT doc_id AS asset_id,
               CAST(MIN(w) AS INT) AS out_w,
               CAST(MIN(h) AS INT) AS out_h,
               CAST(SUM(g) AS BIGINT) AS gray_sum,
               CAST(MIN(g) AS BIGINT) AS gray_min,
               CAST(MAX(g) AS BIGINT) AS gray_max,
               CAST(MAX(CASE WHEN r = 0 AND c = 0 THEN g END) AS BIGINT) AS corner
        FROM px GROUP BY doc_id
    """,
    tags=("I-image",),
)
def multimodal_image_grayscale(spark, sf_dir):
    """REAL RGB→grayscale conversion through the actual codec path:
    a per-asset gradient pattern (channels offset by 97 so luma mixes
    three distinct values) is PPM-encoded, decoded back, converted
    with the INTEGER BT.601 luma (299·R + 587·G + 114·B) // 1000 —
    the fixed-point form real pipelines use so the result is exact —
    and summarized (dims, gray sum/min/max, corner).  The oracle
    recomputes the luma symbolically from the pattern arithmetic, so
    hash equality proves encode → decode → weighted-mix end-to-end
    (the multimodal_resize_halve discipline applied to color-space
    conversion).

    100 TB posture: same Arrow mapInPandas seam as every codec
    operator — per-asset work, pixels never leave the executor, typed
    scalar summary out (the grayscale planes themselves would flow
    back as binary columns through the identical seam)."""
    from etl_builder_spark.llm.codecs import decode_ppm, encode_ppm
    from etl_builder_spark.session import load_table

    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 300).select("doc_id").distinct()

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("asset_id", "out_w", "out_h", "gray_sum", "gray_min", "gray_max", "corner")
        for pdf in batches:
            out = {k: [] for k in cols}
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = did % 6 + 3, did % 4 + 2
                r = np.arange(h)[:, None, None]
                c = np.arange(w)[None, :, None]
                ch = np.arange(3)[None, None, :]
                px = ((did * 11 + r * 31 + c * 13 + ch * 97) % 256).astype(np.uint8)
                dec = decode_ppm(encode_ppm(px)).astype(np.int64)
                gray = (dec[:, :, 0] * 299 + dec[:, :, 1] * 587 + dec[:, :, 2] * 114) // 1000
                out["asset_id"].append(did)
                out["out_w"].append(w)
                out["out_h"].append(h)
                out["gray_sum"].append(int(gray.sum()))
                out["gray_min"].append(int(gray.min()))
                out["gray_max"].append(int(gray.max()))
                out["corner"].append(int(gray[0, 0]))
            yield pd.DataFrame(out)

    return d.mapInPandas(
        work,
        "asset_id long, out_w int, out_h int, gray_sum long, gray_min long, "
        "gray_max long, corner long",
    )


@register(
    "multimodal_audio_vad_energy",
    oracle="""
        WITH base AS (
            SELECT doc_id, (doc_id % 20 + 2) * 160 AS n
            FROM (SELECT DISTINCT doc_id FROM documents) documents WHERE doc_id < 400
        ),
        frames AS (
            SELECT doc_id, n, k.i AS k,
                   (SELECT SUM(CAST((((doc_id * 31 + (k.i * 160 + j.i) * 17) % 65536)
                                     - 32768) AS BIGINT)
                               * (((doc_id * 31 + (k.i * 160 + j.i) * 17) % 65536)
                                  - 32768))
                    FROM unnest(range(0, 160)) AS j(i)) AS energy
            FROM base, unnest(range(0, n // 160)) AS k(i)
        )
        SELECT doc_id AS asset_id,
               CAST(MIN(n) // 160 AS BIGINT) AS n_frames,
               CAST(SUM(CASE WHEN energy > 57000000000 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_voiced,
               CAST(MAX(energy) AS BIGINT) AS max_energy,
               CAST(MIN(energy) AS BIGINT) AS min_energy
        FROM frames GROUP BY doc_id
    """,
    tags=("I-audio",),
)
def multimodal_audio_vad_energy(spark, sf_dir):
    """Energy-threshold voice-activity detection through the real WAV
    codec path: the deterministic PCM pattern (sample_j =
    (id·31 + j·17) mod 65536 − 32768, the audio-family fixture) is
    WAV-encoded, decoded back, framed at 160 samples (10 ms @ 16 kHz),
    and each frame's INTEGER energy Σ s² compared against a fixed
    threshold — the exact-arithmetic skeleton of the VAD gate every
    speech-data pipeline runs before transcription.  The oracle
    recomputes frame energies symbolically, so hash equality proves
    encode → decode → framing → energy end-to-end.  Per-asset summary:
    frame count, voiced-frame count, min/max frame energy (all exact
    BIGINT — squares of int16 sum far below 2^63).

    100 TB posture: the standard per-asset Arrow mapInPandas seam;
    frame loops are numpy reshapes inside the executor, output is the
    typed per-asset row a curation pipeline stores."""
    from etl_builder_spark.llm.codecs import decode_wav, encode_wav
    from etl_builder_spark.session import load_table

    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 400).select("doc_id").distinct()

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("asset_id", "n_frames", "n_voiced", "max_energy", "min_energy")
        for pdf in batches:
            out = {k: [] for k in cols}
            for did in pdf["doc_id"]:
                did = int(did)
                n = (did % 20 + 2) * 160
                j = np.arange(n, dtype=np.int64)
                samples = ((did * 31 + j * 17) % 65536 - 32768).astype(np.int16)
                dec, _rate = decode_wav(encode_wav(samples))
                frames = dec.astype(np.int64).reshape(-1, 160)
                energy = (frames * frames).sum(axis=1)
                out["asset_id"].append(did)
                out["n_frames"].append(int(len(energy)))
                out["n_voiced"].append(int((energy > 57_000_000_000).sum()))
                out["max_energy"].append(int(energy.max()))
                out["min_energy"].append(int(energy.min()))
            yield pd.DataFrame(out)

    return d.mapInPandas(
        work,
        "asset_id long, n_frames long, n_voiced long, max_energy long, min_energy long",
    )


@register(
    "multimodal_shot_boundaries",
    oracle="""
        WITH base AS (
            SELECT doc_id, doc_id % 8 + 6 AS n_frames,
                   doc_id % 5 + 4 AS w, doc_id % 3 + 3 AS h
            FROM documents WHERE doc_id < 250
        ),
        fsums AS (
            SELECT doc_id, n_frames, f.i AS f,
                   (SELECT SUM((doc_id * 13 + (f.i // 3) * 50 + r.i * 31
                                + c.i * 17 + ch.i * 97) % 256)
                    FROM unnest(range(0, h)) AS r(i),
                         unnest(range(0, w)) AS c(i),
                         unnest(range(0, 3)) AS ch(i)) AS fsum
            FROM base, unnest(range(0, n_frames)) AS f(i)
        ),
        deltas AS (
            SELECT doc_id, n_frames, f, fsum,
                   ABS(fsum - LAG(fsum) OVER (PARTITION BY doc_id ORDER BY f))
                       AS delta
            FROM fsums
        )
        SELECT doc_id AS asset_id,
               CAST(MIN(n_frames) AS BIGINT) AS n_frames,
               CAST(SUM(CASE WHEN delta > 400 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_boundaries,
               CAST(MIN(CASE WHEN delta > 400 THEN f END) AS BIGINT)
                   AS first_boundary
        FROM deltas GROUP BY doc_id
    """,
    tags=("I-video",),
)
def multimodal_shot_boundaries(spark, sf_dir):
    """Shot-boundary detection through the real image codec: each
    asset's frames are gradient patterns whose base intensity jumps
    every 3 frames (shot(f) = f div 3 enters the pixel formula), every
    frame is PPM-encoded and decoded back, and a boundary fires where
    the absolute frame-sum delta exceeds a fixed threshold — the
    integer-exact skeleton of histogram-delta shot detection every
    video curation pipeline runs before keyframe extraction.  Frame
    sums are exact integers through the codec round trip (oracle
    recomputes them symbolically); the lag/delta runs in a per-asset
    window.

    100 TB posture: frames decode per asset inside Arrow batches;
    the only shuffle is the per-asset window over frame-count-sized
    partitions (≤13 rows each)."""
    from pyspark.sql import Window

    from etl_builder_spark.llm.codecs import decode_ppm, encode_ppm
    from etl_builder_spark.session import load_table

    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 250).select("doc_id")

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frames, sums = [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                nf, w, h = did % 8 + 6, did % 5 + 4, did % 3 + 3
                r = np.arange(h)[:, None, None]
                c = np.arange(w)[None, :, None]
                ch = np.arange(3)[None, None, :]
                for f in range(nf):
                    px = ((did * 13 + (f // 3) * 50 + r * 31 + c * 17 + ch * 97) % 256).astype(
                        np.uint8
                    )
                    dec = decode_ppm(encode_ppm(px)).astype(np.int64)
                    ids.append(did)
                    frames.append(f)
                    sums.append(int(dec.sum()))
            yield pd.DataFrame({"doc_id": ids, "f": frames, "fsum": sums})

    fs = d.mapInPandas(work, "doc_id long, f long, fsum long")
    w = Window.partitionBy("doc_id").orderBy("f")
    deltas = fs.select(
        "doc_id",
        "f",
        F.abs(F.col("fsum") - F.lag("fsum").over(w)).alias("delta"),
    )
    return deltas.groupBy(F.col("doc_id").alias("asset_id")).agg(
        (F.max("f") + 1).cast("bigint").alias("n_frames"),
        F.sum(F.when(F.col("delta") > 400, 1).otherwise(0)).cast("bigint").alias("n_boundaries"),
        F.min(F.when(F.col("delta") > 400, F.col("f"))).cast("bigint").alias("first_boundary"),
    )


@register(
    "multimodal_image_whash",
    oracle="""
        WITH base AS (
            SELECT doc_id FROM (SELECT DISTINCT doc_id FROM documents) documents WHERE doc_id < 200
        ),
        coeffs AS (
            SELECT doc_id, u.i AS u, v.i AS v,
                   CAST(SUM(
                       (CASE WHEN (bit_count(u.i & r.i) + bit_count(v.i & c.i)) % 2 = 0
                             THEN 1 ELSE -1 END)
                       * (((doc_id*17 + r.i*29 + c.i*23) % 256 * 299
                           + (doc_id*17 + r.i*29 + c.i*23 + 97) % 256 * 587
                           + (doc_id*17 + r.i*29 + c.i*23 + 194) % 256 * 114) // 1000)
                   ) AS BIGINT) AS w
            FROM base,
                 unnest(range(0, 8)) AS r(i), unnest(range(0, 8)) AS c(i),
                 unnest(range(0, 4)) AS u(i), unnest(range(0, 4)) AS v(i)
            GROUP BY doc_id, u.i, v.i
        )
        SELECT doc_id AS asset_id,
               CAST(SUM(CASE WHEN (u <> 0 OR v <> 0) AND w > 0
                             THEN (CAST(1 AS BIGINT) << (u * 4 + v))
                             ELSE 0 END) AS BIGINT) AS whash,
               CAST(MAX(CASE WHEN u = 0 AND v = 0 THEN w END) AS BIGINT) AS dc,
               CAST(SUM(CASE WHEN (u <> 0 OR v <> 0) AND w > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_pos_bits
        FROM coeffs GROUP BY doc_id
    """,
    tags=("I-image",),
)
def multimodal_image_whash(spark, sf_dir):
    """Perceptual image hashing with the Walsh-Hadamard transform —
    the pHash idea with the DCT swapped for WHT so every coefficient
    is an EXACT integer (WHT basis entries are ±1: W(u,v) =
    Σ (−1)^{popcount(u&r)+popcount(v&c)} · gray(r,c)): an 8×8 gray
    block flows through the real PPM encode→decode→integer-luma path,
    the 4×4 low-frequency coefficient block (DC excluded) signs into a
    15-bit hash — equal hashes are near-duplicate image candidates at
    any scale, and the banding machinery the text dedup family uses
    applies verbatim to the hash key.  The oracle recomputes the
    transform symbolically from the pattern arithmetic (DuckDB
    bit_count for the parity), so hash equality proves codec, luma and
    transform end-to-end.

    100 TB posture: per-asset Arrow batches; the 64-pixel transform is
    a numpy matmul inside the executor; output is one 15-bit key per
    asset that a single equi-join groups into candidate clusters."""
    from etl_builder_spark.llm.codecs import decode_ppm, encode_ppm
    from etl_builder_spark.session import load_table

    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200).select("doc_id").distinct()

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        r = np.arange(8)
        # H[u, r] = (-1)^popcount(u & r): the 8-point Walsh-Hadamard basis
        pop = np.array([bin(u & rr).count("1") for u in range(8) for rr in range(8)])
        H = np.where(pop.reshape(8, 8) % 2 == 0, 1, -1).astype(np.int64)
        cols = ("asset_id", "whash", "dc", "n_pos_bits")
        for pdf in batches:
            out = {k: [] for k in cols}
            for did in pdf["doc_id"]:
                did = int(did)
                rr = np.arange(8)[:, None, None]
                cc = np.arange(8)[None, :, None]
                ch = np.arange(3)[None, None, :]
                px = ((did * 17 + rr * 29 + cc * 23 + ch * 97) % 256).astype(np.uint8)
                dec = decode_ppm(encode_ppm(px)).astype(np.int64)
                gray = (dec[:, :, 0] * 299 + dec[:, :, 1] * 587 + dec[:, :, 2] * 114) // 1000
                W = H @ gray @ H.T  # W[u, v], exact integers
                low = W[:4, :4]
                whash = 0
                npos = 0
                for u in range(4):
                    for v in range(4):
                        if (u, v) != (0, 0) and low[u, v] > 0:
                            whash |= 1 << (u * 4 + v)
                            npos += 1
                out["asset_id"].append(did)
                out["whash"].append(int(whash))
                out["dc"].append(int(W[0, 0]))
                out["n_pos_bits"].append(int(npos))
            yield pd.DataFrame(out)

    return d.mapInPandas(
        work, "asset_id long, whash long, dc long, n_pos_bits long"
    )


def _whash_frame(spark, sf_dir):
    """Reuse the registered WHT-hash operator's output frame."""
    from etl_builder_spark.registry import REGISTRY

    return REGISTRY["multimodal_image_whash"].fn(spark, sf_dir)


#: the image_whash oracle body, reused as a CTE by the Hamming search
_WHASH_CTE = """
        wbase AS (
            SELECT doc_id FROM (SELECT DISTINCT doc_id FROM documents) documents WHERE doc_id < 200
        ),
        coeffs AS (
            SELECT doc_id, u.i AS u, v.i AS v,
                   CAST(SUM(
                       (CASE WHEN (bit_count(u.i & r.i) + bit_count(v.i & c.i)) % 2 = 0
                             THEN 1 ELSE -1 END)
                       * (((doc_id*17 + r.i*29 + c.i*23) % 256 * 299
                           + (doc_id*17 + r.i*29 + c.i*23 + 97) % 256 * 587
                           + (doc_id*17 + r.i*29 + c.i*23 + 194) % 256 * 114) // 1000)
                   ) AS BIGINT) AS w
            FROM wbase,
                 unnest(range(0, 8)) AS r(i), unnest(range(0, 8)) AS c(i),
                 unnest(range(0, 4)) AS u(i), unnest(range(0, 4)) AS v(i)
            GROUP BY doc_id, u.i, v.i
        ),
        hashes AS (
            SELECT doc_id AS asset_id,
                   CAST(SUM(CASE WHEN (u <> 0 OR v <> 0) AND w > 0
                                 THEN (CAST(1 AS BIGINT) << (u * 4 + v))
                                 ELSE 0 END) AS BIGINT) AS whash
            FROM coeffs GROUP BY doc_id
        )
"""


@register(
    "dedup_image_whash_hamming",
    oracle=f"""
        WITH {_WHASH_CTE}
        SELECT a.asset_id AS asset_a, b.asset_id AS asset_b,
               CAST(bit_count(CAST(xor(a.whash, b.whash) AS BIGINT)) AS BIGINT)
                   AS hamming
        FROM hashes a JOIN hashes b ON a.asset_id < b.asset_id
        WHERE bit_count(CAST(xor(a.whash, b.whash) AS BIGINT)) <= 2
    """,
    tags=("I-image",),
)
def dedup_image_whash_hamming(spark, sf_dir):
    """Perceptual near-duplicate image SEARCH on the WHT hash: asset
    pairs whose 15-bit (16 with the always-zero DC slot) hashes differ
    in at most 2 bits, found by PIGEONHOLE BANDING — the hash splits
    into 3 bands of ~5 bits, and any pair at Hamming ≤ 2 must agree
    exactly on at least one band, so candidates come from 3 band-key
    equi-joins, never an all-pairs scan (the dedup_simhash_exact
    argument on a new modality).  The oracle IS the brute-force
    all-pairs Hamming join over the same symbolically-recomputed
    hashes, so hash equality re-proves banding completeness on real
    data every round.

    100 TB posture: three shuffles on (band, band_bits) keys with
    fan-out bounded by per-bucket density; the verify step XORs two
    64-bit ints."""
    h = _whash_frame(spark, sf_dir).select("asset_id", "whash").persist()
    bands = h.select(
        "asset_id",
        "whash",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("band"), (F.col("whash") % 32).alias("bits")),
                F.struct(
                    F.lit(1).alias("band"),
                    (F.expr("whash div 32") % 32).alias("bits"),
                ),
                F.struct(
                    F.lit(2).alias("band"),
                    F.expr("whash div 1024").alias("bits"),
                ),
            )
        ).alias("bk"),
    ).select("asset_id", "whash", F.col("bk.band").alias("band"), F.col("bk.bits").alias("bits"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bits") == F.col("b.bits"))
            & (F.col("a.asset_id") < F.col("b.asset_id")),
        )
        .select(
            F.col("a.asset_id").alias("asset_a"),
            F.col("b.asset_id").alias("asset_b"),
            F.col("a.whash").alias("wa"),
            F.col("b.whash").alias("wb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("wa").bitwiseXOR(F.col("wb"))).cast("bigint")
    return cand.select("asset_a", "asset_b", ham.alias("hamming")).where(
        F.col("hamming") <= 2
    )


@register(
    "multimodal_audio_zero_crossings",
    oracle="""
        WITH base AS (
            SELECT doc_id, (doc_id % 20 + 2) * 160 AS n
            FROM (SELECT DISTINCT doc_id FROM documents) documents WHERE doc_id < 400
        ),
        frames AS (
            SELECT doc_id, n, k.i AS k,
                   (SELECT SUM(CASE WHEN
                        (((doc_id * 31 + (k.i * 160 + j.i) * 17) % 65536 - 32768) < 0)
                        <> (((doc_id * 31 + (k.i * 160 + j.i - 1) * 17) % 65536 - 32768) < 0)
                        THEN 1 ELSE 0 END)
                    FROM unnest(range(1, 160)) AS j(i)) AS zc
            FROM base, unnest(range(0, n // 160)) AS k(i)
        )
        SELECT doc_id AS asset_id,
               CAST(MIN(n) // 160 AS BIGINT) AS n_frames,
               CAST(SUM(zc) AS BIGINT) AS total_zc,
               CAST(MAX(zc) AS BIGINT) AS max_frame_zc,
               ROUND(CAST(SUM(zc) AS DOUBLE) / (MIN(n) // 160), 6) AS mean_frame_zc
        FROM frames GROUP BY doc_id
    """,
    tags=("I-audio",),
)
def multimodal_audio_zero_crossings(spark, sf_dir):
    """Zero-crossing rate through the real WAV codec path — the
    classic spectral-proxy feature every VAD/music-speech
    discriminator pairs with frame energy (multimodal_audio_vad_energy
    shares the 160-sample framing): per frame, the count of sign flips
    between consecutive decoded int16 samples; per asset, total/max/
    mean frame ZCR.  Counts are exact integers; the oracle recomputes
    the crossings symbolically from the PCM fixture formula, so hash
    equality proves encode → decode → framing → feature end-to-end.

    100 TB posture: per-asset Arrow mapInPandas seam (one pass, typed
    rows out); the crossing count is one vectorized numpy comparison
    inside the executor — no sample-level rows ever shuffle."""
    from etl_builder_spark.llm.codecs import decode_wav, encode_wav
    from etl_builder_spark.session import load_table

    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 400).select("doc_id").distinct()

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("asset_id", "n_frames", "total_zc", "max_frame_zc", "mean_frame_zc")
        for pdf in batches:
            out = {k: [] for k in cols}
            for did in pdf["doc_id"]:
                did = int(did)
                n = (did % 20 + 2) * 160
                j = np.arange(n, dtype=np.int64)
                samples = ((did * 31 + j * 17) % 65536 - 32768).astype(np.int16)
                dec, _rate = decode_wav(encode_wav(samples))
                frames = dec.astype(np.int64).reshape(-1, 160)
                neg = frames < 0
                zc = (neg[:, 1:] != neg[:, :-1]).sum(axis=1)
                out["asset_id"].append(did)
                out["n_frames"].append(int(len(zc)))
                out["total_zc"].append(int(zc.sum()))
                out["max_frame_zc"].append(int(zc.max()))
                out["mean_frame_zc"].append(round(float(zc.sum()) / len(zc), 6))
            yield pd.DataFrame(out)

    return d.mapInPandas(
        work,
        "asset_id long, n_frames long, total_zc long, max_frame_zc long,"
        " mean_frame_zc double",
    )


def _haar_sample(j: str) -> str:
    """Symbolic decoded PCM sample expression (the audio fixture)."""
    return f"((doc_id * 31 + ({j}) * 17) % 65536 - 32768)"


def _haar_energy_sql() -> tuple[str, str, str]:
    """Per-8-sample-block Haar detail energies as fixed expressions of
    the 8 symbolic samples (b.i = block index)."""
    s = [_haar_sample(f"b.i * 8 + {i}") for i in range(8)]
    e1 = " + ".join(f"({s[2*i]} - {s[2*i+1]}) * ({s[2*i]} - {s[2*i+1]})" for i in range(4))
    p = [f"({s[2*i]} + {s[2*i+1]})" for i in range(4)]
    e2 = " + ".join(f"({p[2*i]} - {p[2*i+1]}) * ({p[2*i]} - {p[2*i+1]})" for i in range(2))
    q = [f"({p[0]} + {p[1]})", f"({p[2]} + {p[3]})"]
    e3 = f"({q[0]} - {q[1]}) * ({q[0]} - {q[1]})"
    return e1, e2, e3


HAAR_E1, HAAR_E2, HAAR_E3 = _haar_energy_sql()


@register(
    "multimodal_audio_haar_bands",
    oracle=f"""
        WITH base AS (
            SELECT doc_id, (doc_id % 20 + 2) * 160 AS n
            FROM (SELECT DISTINCT doc_id FROM documents) documents WHERE doc_id < 400
        ),
        blocks AS (
            SELECT doc_id, n,
                   {HAAR_E1} AS e1, {HAAR_E2} AS e2, {HAAR_E3} AS e3
            FROM base, unnest(range(0, n // 8)) AS b(i)
        )
        SELECT doc_id AS asset_id,
               CAST(MIN(n) // 8 AS BIGINT) AS n_blocks,
               CAST(SUM(e1) AS BIGINT) AS energy_hi,
               CAST(SUM(e2) AS BIGINT) AS energy_mid,
               CAST(SUM(e3) AS BIGINT) AS energy_lo
        FROM blocks GROUP BY doc_id
    """,
    tags=("I-audio",),
)
def multimodal_audio_haar_bands(spark, sf_dir):
    """3-level Haar wavelet band energies through the real WAV codec:
    each 8-sample block of the decoded PCM yields 4 high-band, 2
    mid-band and 1 low-band detail coefficients (±1 basis — pure
    integer adds/subtracts, so energies are EXACT BIGINT), summed per
    asset — the integer-exact skeleton of the subband features audio
    curation uses for bandwidth/speech-music routing, sharing the
    Walsh-Hadamard ±1-basis discipline of multimodal_image_whash.
    The oracle recomputes every coefficient symbolically from the PCM
    fixture, so hash equality proves encode → decode → transform
    end-to-end.

    100 TB posture: per-asset Arrow mapInPandas seam; the wavelet is
    three numpy reshape-subtract passes inside the executor, emitting
    one typed row per asset — no sample-level shuffle."""
    from etl_builder_spark.llm.codecs import decode_wav, encode_wav
    from etl_builder_spark.session import load_table

    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 400).select("doc_id").distinct()

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("asset_id", "n_blocks", "energy_hi", "energy_mid", "energy_lo")
        for pdf in batches:
            out = {k: [] for k in cols}
            for did in pdf["doc_id"]:
                did = int(did)
                n = (did % 20 + 2) * 160
                j = np.arange(n, dtype=np.int64)
                samples = ((did * 31 + j * 17) % 65536 - 32768).astype(np.int16)
                dec, _rate = decode_wav(encode_wav(samples))
                blocks = dec.astype(np.int64).reshape(-1, 8)
                d1 = blocks[:, 0::2] - blocks[:, 1::2]
                p1 = blocks[:, 0::2] + blocks[:, 1::2]
                d2 = p1[:, 0::2] - p1[:, 1::2]
                p2 = p1[:, 0::2] + p1[:, 1::2]
                d3 = p2[:, 0::2] - p2[:, 1::2]
                out["asset_id"].append(did)
                out["n_blocks"].append(int(blocks.shape[0]))
                out["energy_hi"].append(int((d1 * d1).sum()))
                out["energy_mid"].append(int((d2 * d2).sum()))
                out["energy_lo"].append(int((d3 * d3).sum()))
            yield pd.DataFrame(out)

    return d.mapInPandas(
        work,
        "asset_id long, n_blocks long, energy_hi long, energy_mid long,"
        " energy_lo long",
    )


@register(
    "multimodal_keyframe_argmax",
    oracle="""
        WITH base AS (
            SELECT doc_id, doc_id % 8 + 6 AS n_frames,
                   doc_id % 5 + 4 AS w, doc_id % 3 + 3 AS h
            FROM documents WHERE doc_id < 200
        ),
        tv AS (
            SELECT doc_id, f.i AS f, f.i // 3 AS shot,
                   (SELECT SUM(ABS(
                        (doc_id * 13 + (f.i // 3) * 50 + f.i * 7
                         + r.i * 31 + (c.i + 1) * 17 + ch.i * 97) % 256
                        - (doc_id * 13 + (f.i // 3) * 50 + f.i * 7
                           + r.i * 31 + c.i * 17 + ch.i * 97) % 256))
                    FROM unnest(range(0, h)) AS r(i),
                         unnest(range(0, w - 1)) AS c(i),
                         unnest(range(0, 3)) AS ch(i)) AS tv
            FROM base, unnest(range(0, n_frames)) AS f(i)
        )
        SELECT doc_id AS asset_id, CAST(shot AS BIGINT) AS shot,
               CAST(MIN(CASE WHEN (tv, -f) = mx THEN f END) AS BIGINT)
                   AS keyframe,
               CAST(MAX(tv) AS BIGINT) AS keyframe_tv,
               CAST(COUNT(*) AS BIGINT) AS n_frames_in_shot
        FROM (
            SELECT doc_id, shot, f, tv,
                   MAX((tv, -f)) OVER (PARTITION BY doc_id, shot) AS mx
            FROM tv
        )
        GROUP BY doc_id, shot
        ORDER BY asset_id, shot
    """,
    tags=("I-video",),
)
def multimodal_keyframe_argmax(spark, sf_dir):
    """Keyframe selection — the step after multimodal_shot_boundaries
    in every video curation pipeline: within each 3-frame shot, pick
    the sharpest frame by total-variation proxy (sum of absolute
    horizontal pixel deltas, the no-deps stand-in for Laplacian
    sharpness), ties to the EARLIEST frame.  Frames flow through the
    real PPM encode→decode codec (per-frame f·7 term varies pixels
    WITHIN a shot, so the argmax is non-degenerate), and the oracle
    recomputes every TV sum symbolically from the pattern arithmetic.

    The argmax is the de-windowed max(struct(tv, −f)) idiom
    (map-side combinable, VERDICT r4 item 4) — the Spark side carries
    NO per-frame window at all.

    100 TB posture: decode + TV stay inside Arrow batches per asset
    (pixels never shuffle); the only exchange carries (asset, shot,
    frame, tv) rows — frame-count-sized — into a (asset, shot)
    aggregate.  Real decoders swap into the same mapInPandas seam
    (multimodal_decode_meta's contract)."""
    from etl_builder_spark.session import load_table

    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200).select("doc_id")

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from etl_builder_spark.llm.codecs import decode_ppm, encode_ppm

        for pdf in batches:
            ids, fr, tvs = [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                nf, w, h = did % 8 + 6, did % 5 + 4, did % 3 + 3
                r = np.arange(h)[:, None, None]
                c = np.arange(w)[None, :, None]
                ch = np.arange(3)[None, None, :]
                for f in range(nf):
                    px = (
                        (did * 13 + (f // 3) * 50 + f * 7 + r * 31 + c * 17 + ch * 97)
                        % 256
                    ).astype(np.uint8)
                    dec = decode_ppm(encode_ppm(px)).astype(np.int64)
                    tv = int(np.abs(np.diff(dec, axis=1)).sum())
                    ids.append(did)
                    fr.append(f)
                    tvs.append(tv)
            yield pd.DataFrame({"doc_id": ids, "f": fr, "tv": tvs})

    fs = d.mapInPandas(work, "doc_id long, f long, tv long")
    picked = (
        fs.groupBy(
            F.col("doc_id").alias("asset_id"),
            (F.col("f") / 3).cast("bigint").alias("shot"),
        )
        .agg(
            F.max(F.struct(F.col("tv"), (-F.col("f")).alias("negf"))).alias("mx"),
            F.count(F.lit(1)).cast("bigint").alias("n_frames_in_shot"),
        )
        .select(
            "asset_id",
            "shot",
            (-F.col("mx.negf")).cast("bigint").alias("keyframe"),
            F.col("mx.tv").cast("bigint").alias("keyframe_tv"),
            "n_frames_in_shot",
        )
    )
    return picked.orderBy("asset_id", "shot")
