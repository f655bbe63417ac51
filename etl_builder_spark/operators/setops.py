"""G. Set operations (SURVEY.md §2 G1-G4).

UNION ALL is a zero-shuffle concatenation of children; the distinct
variants add one hash-aggregate; INTERSECT/EXCEPT plan as semi/anti
joins with multiset semantics for the ALL forms.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_builder_spark.registry import register
from etl_builder_spark.session import load_table


@register(
    "set_union_all",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_totalprice < 150000
        UNION ALL
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_totalprice >= 150000
    """,
    tags=("G1",),
)
def set_union_all(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
    lo = o.where(F.col("o_totalprice") < 150000)
    hi = o.where(F.col("o_totalprice") >= 150000)
    return lo.unionByName(hi)


@register(
    "set_union_distinct",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("G2",),
)
def set_union_distinct(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@register(
    "set_intersect",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("G3",),
)
def set_intersect(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "set_except_all",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT ALL
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("G4",),
)
def set_except_all(spark, sf_dir):
    """EXCEPT ALL — multiset difference (each right row cancels one
    left occurrence), the stronger form of G4."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.exceptAll(s)


@register(
    "set_intersect_all",
    oracle="""
        SELECT o_orderpriority AS priority FROM orders WHERE o_orderstatus = 'F'
        INTERSECT ALL
        SELECT o_orderpriority AS priority FROM orders WHERE o_totalprice > 100000
    """,
    tags=("G3b",),
)
def set_intersect_all(spark, sf_dir):
    """INTERSECT ALL — multiset intersection (each output row appears
    min(left_count, right_count) times), completing the set-op family.
    Plans as a left-semi-style hash join over per-row sequence numbers;
    one shuffle per side on the full row key, partial counts map-side."""
    f = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F").select(
        F.col("o_orderpriority").alias("priority")
    )
    hi = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 100000).select(
        F.col("o_orderpriority").alias("priority")
    )
    return f.intersectAll(hi)


@register(
    "set_symmetric_diff",
    oracle="""
        WITH a AS (SELECT DISTINCT o_custkey AS custkey FROM orders
                   WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                     AND o_orderdate <  TIMESTAMP '1997-01-01'),
        b AS (SELECT DISTINCT o_custkey AS custkey FROM orders
              WHERE o_orderdate >= TIMESTAMP '1997-01-01'
                AND o_orderdate <  TIMESTAMP '1998-01-01')
        SELECT custkey, side FROM (
            SELECT custkey, 'only_1996' AS side FROM a
            WHERE custkey NOT IN (SELECT custkey FROM b)
            UNION ALL
            SELECT custkey, 'only_1997' AS side FROM b
            WHERE custkey NOT IN (SELECT custkey FROM a)
        )
        ORDER BY custkey, side
    """,
    tags=("G5",),
)
def set_symmetric_diff(spark, sf_dir):
    """Symmetric difference with provenance — (A∖B) ∪ (B∖A), each row
    tagged with WHICH side it came from: the reconciliation query
    behind "keys present in exactly one of two systems/periods"
    audits (completes the G family: union/intersect/except in set and
    multiset forms, now the xor).  Here: customers who ordered in
    1996 xor 1997 — the churned + newly-acquired sets in one result.

    Plans as two anti joins over the deduplicated sides; both sides
    hash on the same key so the anti joins share one
    co-partitioning, and the side tag is a literal, never a second
    pass.  At 100 TB the two period scans partition-prune to their
    date ranges."""
    o = load_table(spark, sf_dir, "orders")

    def active(lo, hi):
        return (
            o.where(
                (F.col("o_orderdate") >= F.lit(lo).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(hi).cast("timestamp"))
            )
            .select(F.col("o_custkey").alias("custkey"))
            .distinct()
        )

    a = active("1996-01-01", "1997-01-01")
    b = active("1997-01-01", "1998-01-01")
    only_a = a.join(b, "custkey", "left_anti").select(
        "custkey", F.lit("only_1996").alias("side")
    )
    only_b = b.join(a, "custkey", "left_anti").select(
        "custkey", F.lit("only_1997").alias("side")
    )
    return only_a.unionByName(only_b).orderBy("custkey", "side")
