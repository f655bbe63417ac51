"""Correlated & scalar subqueries (SURVEY.md §4.1: Catalyst
decorrelates EXISTS/IN into semi/anti joins and scalar subqueries into
aggregated joins — declared here in SQL form so that rewrite machinery
is actually exercised and oracle-checked).
"""

from __future__ import annotations

from etl_builder_spark.registry import register
from etl_builder_spark.session import load_table

_ABOVE_AVG_SQL = """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM {orders} o
    WHERE o_totalprice > (
        SELECT 1.5 * (CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                      / COUNT(*))
        FROM {orders} o2
        WHERE o2.o_custkey = o.o_custkey
    )
"""

_IN_SUBQ_SQL = """
    SELECT c_custkey, c_name, c_nationkey
    FROM {customer}
    WHERE c_nationkey IN (
        SELECT n_nationkey FROM {nation} WHERE n_regionkey = 2
    )
    AND c_custkey NOT IN (
        SELECT o_custkey FROM {orders} WHERE o_totalprice > 450000
    )
"""

_SCALAR_SUBQ_SQL = """
    SELECT o_orderstatus,
           COUNT(*) AS n,
           (SELECT COUNT(*) FROM {orders}) AS n_total
    FROM {orders}
    GROUP BY o_orderstatus
"""


@register(
    "subq_correlated_above_avg",
    oracle=_ABOVE_AVG_SQL.format(orders="orders"),
    tags=("C-subq",),
)
def subq_correlated_above_avg(spark, sf_dir):
    """Correlated scalar subquery: orders 1.5× above their customer's
    average. Catalyst decorrelates into an aggregate + join (no
    per-row re-execution); the average uses the exact-decimal policy
    so the comparison threshold is bit-identical cross-engine."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_ABOVE_AVG_SQL.format(orders="orders"))


@register(
    "subq_in_not_in",
    oracle=_IN_SUBQ_SQL.format(customer="customer", nation="nation", orders="orders"),
    tags=("C-subq",),
)
def subq_in_not_in(spark, sf_dir):
    """IN / NOT IN subqueries → semi/anti joins (null-free corpus keeps
    NOT IN's three-valued-logic hazard inert; documented anyway)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_IN_SUBQ_SQL.format(customer="customer", nation="nation", orders="orders"))


@register(
    "subq_scalar_uncorrelated",
    oracle=_SCALAR_SUBQ_SQL.format(orders="orders"),
    tags=("C-subq",),
)
def subq_scalar_uncorrelated(spark, sf_dir):
    """Uncorrelated scalar subquery — planned once, broadcast as a
    literal into every row."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_SCALAR_SUBQ_SQL.format(orders="orders"))


_LATERAL_SQL = """
    SELECT n.n_name, t.c_custkey, t.c_acctbal
    FROM {nation} n,
    LATERAL (
        SELECT c_custkey, c_acctbal
        FROM {customer} c
        WHERE c.c_nationkey = n.n_nationkey
        ORDER BY c.c_acctbal DESC, c_custkey
        LIMIT 3
    ) t
"""


@register(
    "subq_lateral_topk",
    oracle=_LATERAL_SQL.format(nation="nation", customer="customer"),
    tags=("C-lateral",),
)
def subq_lateral_topk(spark, sf_dir):
    """LATERAL correlated subquery — top-3 customers by balance per
    nation, written as the SQL-standard lateral form (Spark 3.2+'s
    LateralJoin).  Catalyst rewrites the correlated ORDER BY/LIMIT
    into a per-key window top-k (the same WindowGroupLimit shape as
    win_topk_per_group) rather than re-running the inner query per
    outer row; the unique-key tiebreak pins ties cross-engine."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_LATERAL_SQL.format(nation="nation", customer="customer"))
