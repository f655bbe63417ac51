"""Sketch aggregates (SURVEY.md §2 D13): HyperLogLog and Count-Min as
first-class mergeable aggregates — the 100 TB substitutes for exact
distinct/frequency when an estimate suffices. Sketches are binary,
mergeable across partitions and across time (e.g. daily sketch
parquet, unioned for any date range without re-scanning raw data).

Estimates are engine-specific by construction → the declared query is
rows-only (SURVEY §7.2.6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_builder_spark.registry import register
from etl_builder_spark.session import load_table


def hll_sketch(col: str | Column, lg_k: int = 12) -> Column:
    """Mergeable HLL sketch aggregate (Datasketches binary)."""
    return F.hll_sketch_agg(col, F.lit(lg_k))


def hll_estimate(sketch: Column) -> Column:
    return F.hll_sketch_estimate(sketch)


def hll_merge(sketch: Column) -> Column:
    """Union partial sketches (e.g. per-day) into one."""
    return F.hll_union_agg(sketch)


def count_min(col: str | Column, eps: float = 0.001, confidence: float = 0.99, seed: int = 42) -> Column:
    """Count-Min sketch aggregate — binary, mergeable; point-frequency
    estimates for heavy-hitter queries."""
    return F.count_min_sketch(col, F.lit(eps), F.lit(confidence), F.lit(seed))


@register(
    "sketch_hll_users",
    oracle=None,  # HLL estimates differ across engines → rows-only
    tags=("D13",),
)
def sketch_hll_users(spark, sf_dir) -> DataFrame:
    """Per-type user sketches + a merged all-types estimate row —
    demonstrates the partial-sketch → union pattern that replaces
    global COUNT(DISTINCT) at 100 TB."""
    e = load_table(spark, sf_dir, "events")
    per_type = e.groupBy("event_type").agg(hll_sketch("user_id").alias("sk"))
    per_type_est = per_type.select(
        "event_type", hll_estimate(F.col("sk")).alias("approx_users")
    )
    merged = per_type.agg(hll_merge(F.col("sk")).alias("sk")).select(
        F.lit("ALL").alias("event_type"), hll_estimate(F.col("sk")).alias("approx_users")
    )
    return per_type_est.unionByName(merged)
