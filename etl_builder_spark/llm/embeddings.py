"""Embedding-column maintenance ops for the vector half of a training
pipeline: L2 normalization and int8 quantization (the storage format
most ANN/serving systems ingest).

Everything is expression-only array math (transform/aggregate) — JVM
codegen, no UDF, scan-shaped (zero shuffles), so at 100 TB it is
bounded by parquet read + write bandwidth.

Determinism discipline: quantization uses ``floor(x * 127 / norm +
0.5)`` — identical IEEE double expressions on both engines — rather
than ``round()``, whose half-way tie behavior is engine-library
dependent; the quantized int array serializes via array_join for
driver-hashable output (§7.2.8).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from etl_builder_spark.registry import register
from etl_builder_spark.session import load_table


def l2_norm(v: Column) -> Column:
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


@register(
    "embed_normalize_quantize",
    oracle="""
        WITH vecs AS (
            SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings
        ),
        normed AS (
            SELECT vec_id, v,
                   sqrt(list_sum(list_transform(v, x -> x * x))) AS norm
            FROM vecs
        )
        SELECT vec_id,
               ROUND(norm, 6) AS norm,
               len(v) AS dim,
               array_to_string(
                   list_transform(v, x -> CAST(CAST(floor(x * 127.0 / nullif(norm, 0.0) + 0.5)
                                                   AS BIGINT) AS VARCHAR)),
                   '|') AS q8
        FROM normed
    """,
    tags=("I-embed",),
)
def embed_normalize_quantize(spark, sf_dir):
    """Per-vector L2 norm + int8 quantization of the unit-normalized
    vector (symmetric scale 127). Scan-shaped: no shuffle, no UDF."""
    e = load_table(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    # norm as a materialized projection column, NOT inlined into the
    # quantize lambda — inlined it would re-run the O(d) fold per
    # element (O(d²)/row) unless Catalyst happens to subexpress it
    base = e.select(
        "vec_id", F.size("embedding").cast("long").alias("dim"), v.alias("v")
    ).withColumn("norm", l2_norm(F.col("v")))
    q8 = F.transform(
        F.col("v"),
        lambda x: F.floor(
            x * F.lit(127.0) / F.nullif(F.col("norm"), F.lit(0.0)) + F.lit(0.5)
        ).cast("string"),
    )
    return base.select(
        "vec_id",
        F.round("norm", 6).alias("norm"),
        "dim",
        F.array_join(q8, "|").alias("q8"),
    )
