"""A. Scans (SURVEY.md §2 A1-A2).

Scale notes: `spark.read.parquet` is the vectorized columnar reader;
composing `.select`/`.where` on top lets Catalyst push predicates into
row-group/page stats and prune columns — at 100 TB the pruned scan
reads only the referenced columns and skips row groups by min/max.
Plan assertions for PushedFilters/ReadSchema live in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_builder_spark.registry import register
from etl_builder_spark.session import load_table


@register(
    "scan_parquet_full",
    oracle="SELECT * FROM nation",
    tags=("A1",),
)
def scan_parquet_full(spark, sf_dir):
    return load_table(spark, sf_dir, "nation")


@register(
    "scan_parquet_pruned",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
          AND l_quantity < 10
    """,
    tags=("A2",),
)
def scan_parquet_pruned(spark, sf_dir):
    """Column pruning + filter pushdown: only 4 of 16 columns read,
    predicates reach the parquet scan (asserted in tests/test_plans.py)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        & (F.col("l_quantity") < 10)
    )
