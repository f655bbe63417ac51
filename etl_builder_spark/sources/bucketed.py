"""Bucketed table layouts + co-located joins (SURVEY.md §4 cap → r4
declared key).

Partitioning prunes directories; BUCKETING pre-shuffles them: a table
written ``bucketBy(N, key)`` is physically hash-distributed into N
bucket files per partition, and the bucket spec is recorded in the
catalog.  A join of two tables bucketed the same way on the join key
needs NO exchange on either side — at 100 TB this converts the
nightly fact⋈fact reconciliation from two full shuffles into a
zero-shuffle sort-merge, the single biggest repeated-join saving
there is.  (The toy corpus sits under the broadcast threshold, so the
shuffle-free SMJ shape is pinned by the plan test with broadcast
disabled; values are identical either way.)

The corpus ships single parquet files, so this module stages bucketed
external tables (8 buckets on the order key) once per session into
the warehouse-temp dir; bucket metadata lives in the session catalog,
so staging re-registers (cheaply rewriting if needed) when a fresh
session arrives.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from etl_builder_spark.policy import money
from etl_builder_spark.registry import register
from etl_builder_spark.session import load_table

N_BUCKETS = 8


def staged_bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """lineitem and orders as external bucketed tables (8 buckets on
    the order key, bucket-sorted), registered in the session catalog.
    Returns (lineitem_table, orders_table) names."""
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    tl, to = f"lineitem_bkt_{tag}", f"orders_bkt_{tag}"
    stage = os.path.join(tempfile.gettempdir(), "etl_builder_spark_bucketed", tag)

    def _stale(marker: str, src: str) -> bool:
        # Freshness mirrors partitioned._staged marker: the corpus is
        # known to regenerate in place between rounds, and a catalog
        # tableExists check alone would silently serve stale bucketed
        # copies while the DuckDB oracle reads the fresh files
        # (ADVICE r4).
        return not os.path.exists(marker) or os.path.getmtime(marker) < os.path.getmtime(src)

    ml = os.path.join(stage, "_staged_lineitem")
    if not spark.catalog.tableExists(tl) or _stale(ml, os.path.join(sf_dir, "lineitem.parquet")):
        (
            load_table(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_extendedprice", "l_discount")
            .write.mode("overwrite")
            .bucketBy(N_BUCKETS, "l_orderkey")
            .sortBy("l_orderkey")
            .option("path", os.path.join(stage, "lineitem"))
            .format("parquet")
            .saveAsTable(tl)
        )
        os.makedirs(stage, exist_ok=True)
        with open(ml, "w") as f:
            f.write("ok")
    mo = os.path.join(stage, "_staged_orders")
    if not spark.catalog.tableExists(to) or _stale(mo, os.path.join(sf_dir, "orders.parquet")):
        (
            load_table(spark, sf_dir, "orders")
            .select("o_orderkey", "o_orderdate")
            .write.mode("overwrite")
            .bucketBy(N_BUCKETS, "o_orderkey")
            .sortBy("o_orderkey")
            .option("path", os.path.join(stage, "orders"))
            .format("parquet")
            .saveAsTable(to)
        )
        os.makedirs(stage, exist_ok=True)
        with open(mo, "w") as f:
            f.write("ok")
    return tl, to


@register(
    "join_bucketed_colocated",
    oracle="""
        SELECT strftime(o_orderdate, '%Y-%m') AS o_month,
               COUNT(*) AS n_items,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                   AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1
    """,
    tags=("A-bucketed",),
)
def join_bucketed_colocated(spark, sf_dir):
    """Monthly revenue over the bucketed lineitem⋈orders join.  Both
    sides are bucketed 8-ways on the order key, so with broadcast out
    of the picture the sort-merge join reads bucket i against bucket i
    with NO exchange on either side (plan-asserted in
    tests/test_plans.py with the broadcast threshold disabled — at the
    toy SF Spark rightly prefers a broadcast join, and values are
    layout-invariant, as the single-file-table oracle proves)."""
    tl, to = staged_bucketed_tables(spark, sf_dir)
    l, o = spark.table(tl), spark.table(to)
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("o_month"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(money("l_extendedprice") * (F.lit(1) - money("l_discount")))
            .cast("double")
            .alias("revenue"),
        )
    )


@register(
    "agg_bucketed_no_shuffle",
    oracle="""
        SELECT l_orderkey,
               COUNT(*) AS n_lines,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                   AS total_revenue
        FROM lineitem
        GROUP BY l_orderkey
    """,
    tags=("A-bucketed-agg",),
)
def agg_bucketed_no_shuffle(spark, sf_dir):
    """Aggregation WITHOUT a shuffle: grouping the bucketed lineitem
    table on its bucket key — the layout already hash-distributes
    rows by l_orderkey, so Catalyst recognizes the required
    distribution is satisfied and plans a single-phase HashAggregate
    with ZERO exchanges (plan-asserted in tests/test_plans.py, the
    aggregation twin of join_bucketed_colocated's exchange-free SMJ).

    100 TB posture: this is THE reason fact tables get bucketed by
    their natural aggregation/join key — every per-order rollup and
    every orderkey join skips its exchange forever, paid for by one
    shuffle at write time.  Values are layout-invariant, so the
    oracle aggregates the plain single-file table."""
    tl, _ = staged_bucketed_tables(spark, sf_dir)
    return (
        spark.table(tl)
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(money("l_extendedprice")).cast("double").alias("total_price"),
            F.sum(money("l_extendedprice") * (F.lit(1) - money("l_discount")))
            .cast("double")
            .alias("total_revenue"),
        )
    )
