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


@register(
    "sql_star_join_via_views",
    oracle="""
        SELECT r_name,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders
        JOIN customer ON c_custkey = o_custkey
        JOIN nation ON n_nationkey = c_nationkey
        JOIN region ON r_regionkey = n_regionkey
        GROUP BY r_name
    """,
    tags=("SQL-api",),
)
def sql_star_join_via_views(spark, sf_dir):
    """The SQL-string API surface: the same star-join rollup every
    DataFrame key expresses, but submitted as ANSI SQL over the
    catalog views ``register_views`` installs — proving the engine's
    second front door (BI tools, notebook users, dbt-style SQL
    pipelines) reaches the identical Catalyst plan and identical
    values (the oracle runs the very same SQL text on DuckDB).
    Exact-decimal money discipline applies in SQL exactly as in the
    DataFrame API (policy §7.2).

    100 TB posture: identical to the DataFrame star join (C11) by
    construction — SQL and DataFrame compile to the same logical
    plan, so dims broadcast and the fact aggregates map-side; there
    is no "SQL tax"."""
    from etl_builder_spark.session import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT r_name,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders
        JOIN customer ON c_custkey = o_custkey
        JOIN nation ON n_nationkey = c_nationkey
        JOIN region ON r_regionkey = n_regionkey
        GROUP BY r_name
        """
    )
