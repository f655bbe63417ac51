"""Data-quality checks — the validation layer an ETL builder runs
between ingest and publish: uniqueness, null-rate, referential
integrity, range and set-membership checks, emitted as a single
violations-report DataFrame (one aggregation pass per source table,
no per-check scans).

Each check compiles to a conditional aggregate, so a full table audit
is ONE scan + ONE reduce regardless of how many checks are attached —
the only audit shape that survives 100 TB.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_builder_spark.registry import register
from etl_builder_spark.session import load_table


@dataclass(frozen=True)
class Check:
    name: str
    violation: Column  # boolean column: True = row violates


def not_null(col: str) -> Check:
    return Check(f"not_null:{col}", F.col(col).isNull())


def in_range(col: str, lo, hi) -> Check:
    return Check(f"range:{col}", ~F.col(col).between(lo, hi))


def in_set(col: str, values: tuple) -> Check:
    return Check(f"set:{col}", ~F.col(col).isin(*values))


def matches(col: str, regex: str) -> Check:
    return Check(f"regex:{col}", ~F.col(col).rlike(regex))


def audit(df: DataFrame, checks: list[Check]) -> DataFrame:
    """One-pass audit: total rows + violation count per check."""
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.count(F.when(c.violation, F.lit(1))).alias(c.name) for c in checks
    ]
    wide = df.agg(*aggs)
    names = [c.name for c in checks]
    return wide.selectExpr(
        "n_rows",
        f"stack({len(names)}, "
        + ", ".join(f"'{n}', `{n}`" for n in names)
        + ") as (check_name, n_violations)",
    ).select("check_name", "n_violations", "n_rows")


def check_unique(df: DataFrame, cols: tuple[str, ...]) -> DataFrame:
    """Duplicate-key report: keys with multiplicity > 1."""
    return (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
    )


def check_referential(child: DataFrame, child_key: str, parent: DataFrame, parent_key: str) -> DataFrame:
    """Orphan report: child keys with no parent (anti join)."""
    return (
        child.join(parent, child[child_key] == parent[parent_key], "left_anti")
        .select(F.col(child_key).alias("orphan_key"))
        .groupBy("orphan_key")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


@register(
    "dq_audit_orders",
    oracle="""
        WITH wide AS (
            SELECT COUNT(*) AS n_rows,
                   COUNT(*) FILTER (WHERE o_custkey IS NULL) AS nn,
                   COUNT(*) FILTER (WHERE NOT o_totalprice BETWEEN 0 AND 1000000) AS rng,
                   COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('O','F','P')) AS st,
                   COUNT(*) FILTER (WHERE NOT regexp_matches(o_orderpriority, '^[1-5]-')) AS rx
            FROM orders
        )
        SELECT 'not_null:o_custkey' AS check_name, nn AS n_violations, n_rows FROM wide
        UNION ALL SELECT 'range:o_totalprice', rng, n_rows FROM wide
        UNION ALL SELECT 'set:o_orderstatus', st, n_rows FROM wide
        UNION ALL SELECT 'regex:o_orderpriority', rx, n_rows FROM wide
    """,
    tags=("DQ",),
)
def dq_audit_orders(spark, sf_dir):
    """Single-pass audit of orders: null / range / set / regex checks
    in one conditional-aggregate scan."""
    o = load_table(spark, sf_dir, "orders")
    return audit(
        o,
        [
            not_null("o_custkey"),
            in_range("o_totalprice", 0, 1_000_000),
            in_set("o_orderstatus", ("O", "F", "P")),
            matches("o_orderpriority", "^[1-5]-"),
        ],
    )


@register(
    "dq_orphans_lineitem",
    oracle="""
        SELECT l_orderkey AS orphan_key, COUNT(*) AS n_rows
        FROM lineitem
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
        GROUP BY l_orderkey
    """,
    tags=("DQ",),
)
def dq_orphans_lineitem(spark, sf_dir):
    """Referential-integrity report (empty on the intact corpus —
    asserting zero orphans IS the check)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return check_referential(l, "l_orderkey", o, "o_orderkey")
