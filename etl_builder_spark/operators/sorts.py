"""F. Sorts, limits, top-k (SURVEY.md §2 F1-F3).

Global sort = range-partitioned sample sort (parallel). orderBy+limit
is planned as TakeOrderedAndProject — per-partition top-k then a
k-row merge on the driver, NO global sort (asserted in test_plans.py).
Every limited query carries a total-order tiebreaker ending in a
unique key (policy §7.2.3).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_builder_spark.policy import money
from etl_builder_spark.registry import register
from etl_builder_spark.session import load_table


@register(
    "sort_multikey",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders
        ORDER BY o_orderstatus DESC, o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
    tags=("F1",),
)
def sort_multikey(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_orderstatus").desc(), F.col("o_totalprice").desc(), "o_orderkey")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .limit(100)
    )


@register(
    "topk_global",
    oracle="""
        SELECT l_orderkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
               o_orderdate
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    tags=("F2",),
)
def topk_global(spark, sf_dir):
    """TPC-H Q3-shape: join + agg + global top-10 by revenue.
    Revenue is an exact decimal sum → double, so the ORDER BY key is
    bit-identical across engines; l_orderkey breaks ties totally."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(l, l["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(money("l_extendedprice") * (F.lit(1) - money("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "limit_offset",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 50 OFFSET 200
    """,
    tags=("F3",),
)
def limit_offset(spark, sf_dir):
    """Pagination over a total order. NOTE: OFFSET requires a global
    order; at scale prefer keyset pagination (WHERE key > last_seen)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .select("o_orderkey", "o_totalprice")
        .offset(200)
        .limit(50)
    )


@register(
    "limit_keyset_page",
    oracle="""
        WITH b AS (
            SELECT o_orderdate AS bd, o_orderkey AS bk
            FROM orders
            ORDER BY o_orderdate, o_orderkey
            LIMIT 1 OFFSET 199
        )
        SELECT o_orderkey, o_orderdate, o_totalprice
        FROM orders, b
        WHERE o_orderdate > bd OR (o_orderdate = bd AND o_orderkey > bk)
        ORDER BY o_orderdate, o_orderkey
        LIMIT 100
    """,
    tags=("F3-keyset",),
)
def limit_keyset_page(spark, sf_dir):
    """Keyset (seek) pagination — the SCALE path for F3's OFFSET
    hazard: page N+1 is "rows with (o_orderdate, o_orderkey) strictly
    after the last row of page N", a pushed-down tuple-range filter +
    top-k, not a global sort that materializes and discards OFFSET
    rows.  Here the page-2 boundary tuple is derived in-query (max of
    the first 200 rows under the page order — a TakeOrderedAndProject
    k-row merge) so the key is self-contained; in production the
    client carries the boundary from the previous page and the scan
    starts at the seek predicate directly.

    100 TB posture: both steps are per-partition top-k + k-row driver
    merges (TakeOrderedAndProject — no global sort, no single-partition
    OFFSET slice); the boundary is a broadcast 1-row frame; the seek
    predicate reaches the scan, so with a date-sorted/partitioned
    layout later pages PRUNE everything before the boundary instead of
    reading and discarding it.  Ordering carries the unique o_orderkey
    tiebreak (policy §7.2.3) — OFFSET pagination without a total order
    would silently skip/duplicate rows between pages."""
    o = load_table(spark, sf_dir, "orders")
    page = o.select("o_orderkey", "o_orderdate", "o_totalprice")
    boundary = (
        page.orderBy("o_orderdate", "o_orderkey")
        .limit(200)
        .agg(F.max(F.struct("o_orderdate", "o_orderkey")).alias("b"))
        .select(F.col("b.o_orderdate").alias("bd"), F.col("b.o_orderkey").alias("bk"))
    )
    after = (F.col("o_orderdate") > F.col("bd")) | (
        (F.col("o_orderdate") == F.col("bd")) & (F.col("o_orderkey") > F.col("bk"))
    )
    return (
        page.crossJoin(F.broadcast(boundary))
        .where(after)
        .select("o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy("o_orderdate", "o_orderkey")
        .limit(100)
    )
