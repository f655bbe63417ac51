"""B. Projection, filter, predicates (SURVEY.md §2 B1-B4).

All pure Catalyst constructs — predicates stay inside whole-stage
codegen and push down to the scan; DISTINCT is a hash-aggregate with
map-side partials (no full shuffle of the projected payload).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_builder_spark.policy import money
from etl_builder_spark.registry import register
from etl_builder_spark.session import load_table


@register(
    "project_compute",
    oracle="""
        SELECT l_orderkey,
               l_linenumber,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    * (1 + CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS net_price,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2)) AS DOUBLE) AS disc_amount
        FROM lineitem
    """,
    tags=("B1",),
)
def project_compute(spark, sf_dir):
    """Computed projection with exact decimal arithmetic (policy.py):
    per-row products of DECIMAL(18,2) are exact, cast to DOUBLE is
    round-to-nearest on both engines → bit-identical."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        (money("l_extendedprice") * (F.lit(1) - money("l_discount")) * (F.lit(1) + money("l_tax")))
        .cast("double")
        .alias("net_price"),
        (money("l_extendedprice") * money("l_discount")).cast("double").alias("disc_amount"),
    )


@register(
    "filter_compound",
    oracle="""
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
        FROM orders
        WHERE (o_orderpriority IN ('1-URGENT', '2-HIGH') OR o_orderpriority LIKE '5-%')
          AND o_totalprice BETWEEN 50000 AND 150000
          AND NOT o_orderstatus = 'P'
    """,
    tags=("B2",),
)
def filter_compound(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.where(
        (F.col("o_orderpriority").isin("1-URGENT", "2-HIGH") | F.col("o_orderpriority").like("5-%"))
        & F.col("o_totalprice").between(50000, 150000)
        & ~(F.col("o_orderstatus") == "P")
    ).select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@register(
    "filter_null_semantics",
    oracle="""
        SELECT c_custkey,
               o.o_orderkey AS big_orderkey,
               (o.o_orderkey IS NULL) AS no_big_order,
               (o.o_custkey IS NOT DISTINCT FROM c_custkey) AS cust_match
        FROM customer
        LEFT JOIN (SELECT * FROM orders WHERE o_totalprice >= 450000) o
          ON o.o_custkey = c_custkey
    """,
    tags=("B3",),
)
def filter_null_semantics(spark, sf_dir):
    """IS NULL / IS NOT NULL / null-safe equality over outer-join output —
    the corpus itself is null-free, so the left join is the null source."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") >= 450000)
    joined = c.join(o, o["o_custkey"] == c["c_custkey"], "left")
    return joined.select(
        "c_custkey",
        F.col("o_orderkey").alias("big_orderkey"),
        F.col("o_orderkey").isNull().alias("no_big_order"),
        F.col("o_custkey").eqNullSafe(F.col("c_custkey")).alias("cust_match"),
    )


@register(
    "project_distinct",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    tags=("B4",),
)
def project_distinct(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    return l.select("l_returnflag", "l_linestatus").distinct()
