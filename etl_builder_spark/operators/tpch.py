"""Adapted TPC-H suite over the fixture corpus (SURVEY.md §2 L-rows).

The corpus is TPC-H-ish: the eight classic tables minus ``partsupp``,
with trimmed columns (no comment/phone/address, no l_commitdate /
l_receiptdate / l_shipmode / p_container).  This module carries every
TPC-H query that survives those cuts, adapted minimally and named for
its original:

- Q1 already exists as ``agg_pricing_summary`` (the round-1 flagship);
  Q3/Q5's plan shapes landed early as ``topk_global`` and
  ``join_multiway_star``, and the literal adaptations are now named
  keys here too (``tpch_q3_shipping_priority``,
  ``tpch_q5_local_supplier_volume``).
- Q2, Q11, Q16, Q20 need ``partsupp`` and are not expressible here.
- Q4/Q12/Q21 originally hinge on l_commitdate/l_receiptdate; the
  adaptation uses ship-vs-order-date lateness, which preserves the
  plan shape (EXISTS decorrelation, CASE aggregation, multi-EXISTS).
- Q13/Q19/Q22 predicates are restated over surviving columns.

Determinism: every money aggregate follows the policy.py exact-decimal
pattern; ratios divide two bit-identical doubles; every LIMIT has a
total-order tiebreaker.

Scale posture: nation/region/supplier always broadcast; part and
customer broadcast at small SF and demote to shuffle joins under AQE
as they grow; every aggregation is partial-then-final around a single
key exchange.  EXISTS/NOT EXISTS are expressed as semi/anti joins —
the decorrelated form Catalyst would rewrite to anyway.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_builder_spark.policy import money
from etl_builder_spark.registry import register
from etl_builder_spark.session import load_table

#: exact-decimal revenue term — oracle twin:
#: CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
def _rev():
    return money("l_extendedprice") * (F.lit(1) - money("l_discount"))


_REV_SQL = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"


@register(
    "tpch_q3_shipping_priority",
    oracle=f"""
        SELECT l_orderkey,
               CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
               o_orderdate, o_orderpriority
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1997-03-15'
          AND l_shipdate  > TIMESTAMP '1997-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10
    """,
    tags=("L-q3",),
)
def tpch_q3_shipping_priority(spark, sf_dir):
    """Q3: top-10 unshipped BUILDING-segment orders by pending
    revenue as of 1997-03-15 (o_orderpriority stands in for the
    absent o_shippriority; the date moves inside the corpus's
    1995–2001 span).  Customer is the small side — filtered on
    segment and broadcast into orders, so the only shuffle pair is
    orders↔lineitem on orderkey; the exact-decimal revenue ranks with
    (o_orderdate, l_orderkey) as the total tiebreaker and the LIMIT
    rides TakeOrderedAndProject instead of a global sort."""
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1997-03-15").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1997-03-15").cast("timestamp")
    )
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(l, l["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "tpch_q5_local_supplier_volume",
    oracle=f"""
        SELECT n_name, CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
                     AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """,
    tags=("L-q5",),
)
def tpch_q5_local_supplier_volume(spark, sf_dir):
    """Q5: 1996 revenue by nation where an ASIA customer bought from
    a same-nation supplier.  The distinguishing join is the non-key
    c_nationkey = s_nationkey equality folded into the
    lineitem↔supplier join; supplier/nation/region broadcast, so the
    only shuffles are orders↔customer-filtered rows and
    lineitem↔orders on their natural keys; the final aggregate is ≤25
    nation groups with map-side partials."""
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    asia_nations = n.join(
        F.broadcast(r), n["n_regionkey"] == r["r_regionkey"]
    ).select("n_nationkey", "n_name")
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(l, l["l_orderkey"] == o["o_orderkey"])
        .join(
            F.broadcast(s),
            (l["l_suppkey"] == s["s_suppkey"])
            & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(F.broadcast(asia_nations), s["s_nationkey"] == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@register(
    "tpch_q4_priority_exists",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-07-01'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY o_orderpriority
    """,
    tags=("L-q4",),
)
def tpch_q4_priority_exists(spark, sf_dir):
    """Q4 adapted: priority counts of 1996-H1 orders with at least one
    line shipped >60 days after order date (stands in for the original
    commit-vs-receipt lateness).  EXISTS = left-semi join on orderkey
    with the lateness predicate in the join condition — one shuffle
    pair, then a tiny priority aggregate."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l.l_orderkey") == F.col("o.o_orderkey")) & (
        F.col("l.l_shipdate") > F.col("o.o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.alias("o")
        .join(l.alias("l"), late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "tpch_q6_forecast_revenue",
    oracle=f"""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    tags=("L-q6",),
)
def tpch_q6_forecast_revenue(spark, sf_dir):
    """Q6: pure scan-and-sum forecast revenue — the benchmark's
    pushdown showcase.  All four predicates reach the parquet scan;
    the aggregate is a single partial+final pair with no keys."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(money("l_extendedprice") * money("l_discount"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "tpch_q7_volume_shipping",
    oracle=f"""
        SELECT supp_nation, cust_nation, l_year,
               CAST(SUM(volume) AS DOUBLE) AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation,
                   n2.n_name AS cust_nation,
                   year(l_shipdate) AS l_year,
                   {_REV_SQL} AS volume
            FROM supplier
            JOIN lineitem ON s_suppkey = l_suppkey
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("L-q7",),
)
def tpch_q7_volume_shipping(spark, sf_dir):
    """Q7: bilateral shipping volume between two nations by year.
    Both nation dims broadcast; the nation-pair filter lands on the
    joined stream before the (supp, cust, year) aggregate."""
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        s.join(l, s["s_suppkey"] == l["l_suppkey"])
        .join(o, o["o_orderkey"] == l["l_orderkey"])
        .join(c, c["c_custkey"] == o["o_custkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@register(
    "tpch_q8_market_share",
    oracle=f"""
        SELECT o_year,
               CAST(SUM(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END) AS DOUBLE)
                   / CAST(SUM(volume) AS DOUBLE) AS mkt_share
        FROM (
            SELECT year(o_orderdate) AS o_year,
                   {_REV_SQL} AS volume,
                   n2.n_name AS nation
            FROM part
            JOIN lineitem ON p_partkey = l_partkey
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region    ON n1.n_regionkey = r_regionkey
            JOIN supplier  ON l_suppkey = s_suppkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
            WHERE r_name = 'ASIA'
              AND p_type = 'ECONOMY'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1998-01-01'
        ) all_nations
        GROUP BY o_year
    """,
    tags=("L-q8",),
)
def tpch_q8_market_share(spark, sf_dir):
    """Q8: NATION_5's share of ECONOMY-part revenue sold to ASIA
    customers, by order year.  The share divides two exact-decimal
    sums cast to double — bit-identical numerator and denominator, so
    no rounding is needed on the quotient."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    s = load_table(spark, sf_dir, "supplier")
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    vol = _rev()
    return (
        p.join(l, p["p_partkey"] == l["l_partkey"])
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), c["c_nationkey"] == n1["n_nationkey"])
        .join(F.broadcast(r), n1["n_regionkey"] == r["r_regionkey"])
        .join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n2), s["s_nationkey"] == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("nation") == "NATION_5", vol).otherwise(F.lit(0)))
                .cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
    )


@register(
    "tpch_q9_profit_by_nation",
    oracle=f"""
        SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
        FROM (
            SELECT n_name AS nation,
                   year(o_orderdate) AS o_year,
                   {_REV_SQL}
                   - CAST(p_retailprice AS DECIMAL(18,2))
                     * CAST(l_quantity AS DECIMAL(18,2)) AS amount
            FROM part
            JOIN lineitem ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN nation   ON s_nationkey = n_nationkey
        ) profit
        GROUP BY nation, o_year
    """,
    tags=("L-q9",),
)
def tpch_q9_profit_by_nation(spark, sf_dir):
    """Q9 adapted: profit by supplier nation and order year.  The
    original costs lines at ps_supplycost (partsupp is absent from the
    corpus); the adaptation costs them at p_retailprice * quantity,
    keeping the same 5-table join tree and exact-decimal arithmetic."""
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    amount = _rev() - money("p_retailprice") * money("l_quantity")
    return (
        p.join(l, p["p_partkey"] == l["l_partkey"])
        .join(F.broadcast(s), s["s_suppkey"] == l["l_suppkey"])
        .join(o, o["o_orderkey"] == l["l_orderkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


@register(
    "tpch_q9_profit_selective",
    oracle=f"""
        SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
        FROM (
            SELECT n_name AS nation,
                   year(o_orderdate) AS o_year,
                   {_REV_SQL}
                   - CAST(p_retailprice AS DECIMAL(18,2))
                     * CAST(l_quantity AS DECIMAL(18,2)) AS amount
            FROM part
            JOIN lineitem ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN nation   ON s_nationkey = n_nationkey
            WHERE p_retailprice >= 905 AND p_retailprice < 915
        ) profit
        GROUP BY nation, o_year
    """,
    tags=("L-q9-selective",),
)
def tpch_q9_profit_selective(spark, sf_dir):
    """Q9's selective twin: the original Q9 filters part on ``p_name
    LIKE '%green%'`` (a ~1/17 selective dim filter); the corpus keeps
    p_name but with arbitrary synthetic tokens, so the equivalent
    selective-scan character is restored with a ``p_retailprice``
    band (~10% of part).  Same 5-table join tree and arithmetic as
    ``tpch_q9_profit_by_nation``.

    100 TB posture: the band predicate pushes into the part scan
    (PushedFilters, plan-asserted), and because part is the FILTERED
    build side of the part⋈lineitem shuffle join, Spark's runtime
    bloom-filter injection prunes lineitem rows on l_partkey BEFORE
    the shuffle once the sides clear the size thresholds — the exact
    filtered-dim-too-big-to-broadcast lever demonstrated end-to-end in
    tests/test_plans.py::test_q9_selective_pushdown_and_bloom."""
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_retailprice").where(
        (F.col("p_retailprice") >= 905) & (F.col("p_retailprice") < 915)
    )
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    amount = _rev() - money("p_retailprice") * money("l_quantity")
    return (
        p.join(l, p["p_partkey"] == l["l_partkey"])
        .join(F.broadcast(s), s["s_suppkey"] == l["l_suppkey"])
        .join(o, o["o_orderkey"] == l["l_orderkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


@register(
    "tpch_q10_returned_items",
    oracle=f"""
        SELECT c_custkey, c_name,
               CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
               c_acctbal, n_name
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-04-01'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    tags=("L-q10",),
)
def tpch_q10_returned_items(spark, sf_dir):
    """Q10: top-20 customers by returned-item revenue in 1996-Q1.
    Ranked on the exact-decimal revenue with c_custkey as the total
    tiebreaker; TakeOrderedAndProject avoids a global sort."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(l, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "tpch_q12_latency_classes",
    oracle="""
        SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                    THEN 'late' ELSE 'ontime' END AS ship_class,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY 1
    """,
    tags=("L-q12",),
)
def tpch_q12_latency_classes(spark, sf_dir):
    """Q12 adapted: priority mix by ship-latency class (l_shipmode and
    commit/receipt dates are absent; >90-days-after-order stands in
    for the late class).  Same CASE-pivot aggregate over one join."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    return (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .groupBy(F.when(late, "late").otherwise("ontime").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q13_order_distribution",
    oracle="""
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer
            LEFT JOIN orders ON c_custkey = o_custkey
                            AND o_orderpriority <> '4-NOT SPECIFIED'
            GROUP BY c_custkey
        ) c_orders
        GROUP BY c_count
    """,
    tags=("L-q13",),
)
def tpch_q13_order_distribution(spark, sf_dir):
    """Q13: customer-by-order-count histogram (the comment-pattern
    exclusion becomes a priority exclusion).  LEFT join keeps
    zero-order customers; COUNT(o_orderkey) ignores the null rows the
    outer join manufactures."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@register(
    "tpch_q14_promo_share",
    oracle=f"""
        SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                                     THEN {_REV_SQL} ELSE 0 END) AS DOUBLE)
                     / CAST(SUM({_REV_SQL}) AS DOUBLE) AS promo_revenue,
               COUNT(*) AS n_lines
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-03-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
    """,
    tags=("L-q14",),
)
def tpch_q14_promo_share(spark, sf_dir):
    """Q14: PROMO-part share of March-1996 revenue.  One broadcast
    join (part is the small side) and a keyless aggregate; the
    percentage divides two exact-decimal sums."""
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = _rev()
    return (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))).cast(
                    "double"
                )
                / F.sum(rev).cast("double")
            ).alias("promo_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "tpch_q15_top_supplier",
    oracle=f"""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   CAST(SUM({_REV_SQL}) AS DOUBLE) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    tags=("L-q15",),
)
def tpch_q15_top_supplier(spark, sf_dir):
    """Q15: the supplier(s) hitting the max quarterly revenue.  The
    scalar MAX subquery becomes a broadcast single-row cross join; the
    equality is between two instances of the same exact-decimal
    double, so ties (and the comparison itself) are deterministic."""
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = (
        l.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev()).cast("double").alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("max_rev"))
    return (
        s.join(rev, s["s_suppkey"] == rev["supplier_no"])
        .crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("max_rev"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "tpch_q17_small_qty_revenue",
    oracle="""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
                   AS avg_yearly,
               COUNT(*) AS n_lines
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#1'
          AND p_size < 10
          AND l_quantity < (
              SELECT 0.5 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                            / COUNT(*))
              FROM lineitem l2
              WHERE l2.l_partkey = p_partkey
          )
    """,
    tags=("L-q17",),
)
def tpch_q17_small_qty_revenue(spark, sf_dir):
    """Q17 adapted: revenue lost to small-quantity orders of Brand#1
    small parts (p_size < 10 stands in for the absent p_container).
    The correlated per-part average decorrelates into an aggregate
    joined back on partkey — exactly what Catalyst does with the SQL
    form, written explicitly here."""
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#1") & (F.col("p_size") < 10)
    ).select("p_partkey")
    l = load_table(spark, sf_dir, "lineitem")
    avg_qty = (
        l.groupBy(F.col("l_partkey").alias("ak"))
        .agg(
            (F.lit(0.5) * (F.sum(money("l_quantity")).cast("double") / F.count(F.lit(1)))).alias(
                "half_avg"
            )
        )
    )
    return (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .join(avg_qty, l["l_partkey"] == F.col("ak"))
        .where(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            (F.sum(money("l_extendedprice")).cast("double") / F.lit(7.0)).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "tpch_q18_large_orders",
    oracle="""
        SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey
            HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250
        )
        GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
    tags=("L-q18",),
)
def tpch_q18_large_orders(spark, sf_dir):
    """Q18: customers behind the largest orders (total quantity > 250,
    ~top 1% of orders at the fixture SF), via the EAGER-AGGREGATION
    rewrite (round 15, VERDICT r14 item 4).  Every output group key is
    functionally dependent on o_orderkey, so the final GROUP BY's
    sum(l_quantity) IS the HAVING subquery's per-order sum — computed
    once, below the joins, instead of re-joining 100% of lineitem and
    re-aggregating it above them.

    Why it matters at scale: the literal formulation's last join
    (orders ⋈ lineitem on orderkey) feeds a group-by that REUSES the
    join's orderkey partitioning, so AQE cannot skew-split it — at
    ×100 skew (one order = 90% of 60M lineitem rows) the hot key's
    54M rows serialize through one task doing join + aggregate
    (measured 43.5 s noop-sink; the eager form runs the same corpus
    in ~9 s).  Here the only pass over lineitem is a hash aggregate
    whose map-side partials collapse the hot key to one row per task,
    and the >250 filter then shrinks the join input to ~1% of orders
    — a broadcast-sized build side at any skew.  Decimal sums keep
    the threshold and output exact."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(money("l_quantity")).alias("qsum"))
        .where(F.col("qsum") > 250)
    )
    # selective join FIRST: big is ~1% of orders, so o ⋈ big shrinks the
    # stream to broadcast size before customer is touched — written
    # (o ⋈ big) ⋈ c because Catalyst keeps the authored join order
    # without CBO stats, and (c ⋈ o) first would shuffle every order on
    # custkey and re-shuffle the join output on orderkey
    return (
        o.join(big, o["o_orderkey"] == big["l_orderkey"])
        .join(c, c["c_custkey"] == o["o_custkey"])
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("qsum").cast("double").alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@register(
    "tpch_q19_disjunctive_revenue",
    oracle=f"""
        SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 20)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
               AND l_quantity BETWEEN 10 AND 30)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
               AND l_quantity BETWEEN 20 AND 40)
    """,
    tags=("L-q19",),
)
def tpch_q19_disjunctive_revenue(spark, sf_dir):
    """Q19 adapted: disjunctive brand/size/quantity bands (p_container
    is absent; p_size ranges stand in).  The OR-of-ANDs predicate sits
    on the joined stream; per-branch part predicates can still prune
    the broadcast build side."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    band = lambda brand, s_lo, s_hi, q_lo, q_hi: (
        (F.col("p_brand") == brand)
        & F.col("p_size").between(s_lo, s_hi)
        & F.col("l_quantity").between(q_lo, q_hi)
    )
    return (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .where(band("Brand#1", 1, 15, 1, 20) | band("Brand#2", 10, 30, 10, 30) | band("Brand#3", 20, 50, 20, 40))
        .agg(
            F.sum(_rev()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "tpch_q21_waiting_supplier",
    oracle="""
        SELECT s_name, COUNT(*) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 365 DAY
          AND EXISTS (
              SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1 FROM lineitem l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_shipdate > o_orderdate + INTERVAL 365 DAY
          )
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
    """,
    tags=("L-q21",),
)
def tpch_q21_waiting_supplier(spark, sf_dir):
    """Q21 adapted: suppliers who were the SOLE >1-year-late shipper on
    a multi-supplier finalized order (ship-vs-order lateness stands in
    for receipt-vs-commit).  The EXISTS/NOT EXISTS pair becomes a
    semi-join then an anti-join against the same lateness frame —
    three shuffles on l_orderkey total, no correlated re-execution."""
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    l1 = (
        l.alias("l1")
        .join(o, F.col("l1.l_orderkey") == o["o_orderkey"])
        .where(F.col("l1.l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 365 DAYS"))
        .select(
            F.col("l1.l_orderkey").alias("orderkey"),
            F.col("l1.l_suppkey").alias("suppkey"),
            F.col("o_orderdate").alias("odate"),
        )
    )
    other = (F.col("l2.l_orderkey") == F.col("orderkey")) & (
        F.col("l2.l_suppkey") != F.col("suppkey")
    )
    other_late = other & (F.col("l2.l_shipdate") > F.col("odate") + F.expr("INTERVAL 365 DAYS"))
    waiting = (
        l1.join(l.alias("l2"), other, "left_semi")
        .join(l.alias("l2"), other_late, "left_anti")
    )
    return (
        waiting.join(F.broadcast(s), F.col("suppkey") == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@register(
    "tpch_q22_dormant_customers",
    oracle="""
        WITH wealthy AS (
            SELECT c_custkey, c_nationkey, c_acctbal
            FROM customer
            WHERE c_acctbal > (
                SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
                FROM customer WHERE c_acctbal > 0.0
            )
        )
        SELECT n_name,
               COUNT(*) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        FROM wealthy
        JOIN nation ON c_nationkey = n_nationkey
        WHERE NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey
              AND o_orderdate >= TIMESTAMP '2000-01-01'
        )
        GROUP BY n_name
    """,
    tags=("L-q22",),
)
def tpch_q22_dormant_customers(spark, sf_dir):
    """Q22 adapted: wealthy-but-dormant customers by nation (no c_phone
    in the corpus, so country digits become the customer's nation; the
    dormancy window is 'no orders since 2000').  Uncorrelated scalar
    average broadcast into the filter, NOT EXISTS as an anti-join."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    avg_pos = (
        c.where(F.col("c_acctbal") > 0.0)
        .agg((F.sum(money("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avg_bal"))
    )
    recent = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select("o_custkey")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.crossJoin(F.broadcast(avg_pos))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, c["c_custkey"] == recent["o_custkey"], "left_anti")
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(money("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )
