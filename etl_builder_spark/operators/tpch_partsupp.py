"""TPC-H Q2/Q11/Q16/Q20 over a DERIVED partsupp (SURVEY.md §2 L-rows).

The fixture corpus has no ``partsupp`` table, which blocked the four
queries that need it (operators/tpch.py module docstring).  This module
closes that gap by DERIVING partsupp deterministically from the two
tables that define its key space — exactly the spirit of dbgen, which
also computes partsupp rows by formula rather than sampling them:

- ``ps_suppkey``: dbgen assigns each part 4 suppliers at stride
  ``S/4 + (p-1)/S``.  The corpus keys are 0-based, so we use the
  0-based stride ``S div 4`` alone (dropping the ``p div S`` spread
  term, which can collide for tiny S: with S=10 the sf0.001 stride
  would hit 5 and map i=0/i=2 to the same supplier).  ``i*(S div 4)``
  for i in 0..3 spans < S, so the 4 suppliers per part are always
  distinct for S >= 4.
- ``ps_availqty`` / ``ps_supplycost``: dbgen draws them uniformly; we
  use the engine-portable Knuth multiplicative mixer (the
  sample_hash_deterministic pattern) on (partkey, suppkey, salt).
  The multiplier 1597334677 keeps every intermediate product under
  2^63 (operand < 2^32 ensured by the interleaved mod), so the math
  is exact BIGINT on both engines.  Supply cost is carried as integer
  CENTS end-to-end (policy §7.2: all cross-row arithmetic exact; the
  only float op is one final identical IEEE division by 100).

Both engines build the SAME rows from the SAME inputs, so the four
queries grade under the full DuckDB hash oracle like any other key.

Scale posture: partsupp is 4x|part| rows built from a projection of
part crossed with a 4-row literal and a broadcast 1-row supplier
count — no shuffle to create it, and it re-derives per query instead
of being persisted (at 100 TB it would be written once as a bucketed
table; the queries below only ever join it on ps_partkey/ps_suppkey,
both of which survive that layout unchanged).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from etl_builder_spark.folding import nan_to_null

from etl_builder_spark.registry import register
from etl_builder_spark.session import load_table

#: Knuth-style 32-bit odd multiplier small enough that (2^32)·MIX < 2^63.
MIX = 1597334677
M32 = 4_294_967_296


def _mix(c):
    """(c * MIX) mod 2^32 — exact BIGINT on both engines for c < 2^32."""
    return F.pmod(c * F.lit(MIX), F.lit(M32))


def derived_partsupp(spark, sf_dir):
    """The derived partsupp DataFrame: (ps_partkey, ps_suppkey,
    ps_availqty, ps_supplycost_cents), 4 rows per part."""
    part = load_table(spark, sf_dir, "part").select("p_partkey")
    s_cnt = load_table(spark, sf_dir, "supplier").agg(
        F.count(F.lit(1)).alias("s_cnt")
    )
    quarters = spark.range(4).select(F.col("id").alias("i"))
    base = (
        part.crossJoin(F.broadcast(quarters))
        .crossJoin(F.broadcast(s_cnt))
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            F.pmod(
                F.col("p_partkey") + F.col("i") * F.expr("s_cnt div 4"),
                F.col("s_cnt"),
            ).alias("ps_suppkey"),
        )
    )
    u0 = _mix(F.pmod(_mix(F.col("ps_partkey")) + F.col("ps_suppkey") * 10, F.lit(M32)))
    u1 = _mix(
        F.pmod(_mix(F.col("ps_partkey")) + F.col("ps_suppkey") * 10 + 1, F.lit(M32))
    )
    return base.select(
        "ps_partkey",
        "ps_suppkey",
        (F.lit(1) + F.pmod(u0, F.lit(9999))).alias("ps_availqty"),
        (F.lit(100) + F.pmod(u1, F.lit(99901))).alias("ps_supplycost_cents"),
    )


#: oracle twin of derived_partsupp — paste into WITH lists.
PARTSUPP_CTE = """
    scount AS (SELECT COUNT(*) AS s_cnt FROM supplier),
    ps_base AS (
        SELECT p_partkey AS ps_partkey,
               (p_partkey + t.i * (s_cnt // 4)) % s_cnt AS ps_suppkey
        FROM part CROSS JOIN (VALUES (0), (1), (2), (3)) AS t(i)
        CROSS JOIN scount
    ),
    partsupp AS (
        SELECT ps_partkey, ps_suppkey,
               1 + ((ps_partkey * 1597334677) % 4294967296 + ps_suppkey * 10)
                   % 4294967296 * 1597334677 % 4294967296 % 9999
                   AS ps_availqty,
               100 + ((ps_partkey * 1597334677) % 4294967296 + ps_suppkey * 10 + 1)
                   % 4294967296 * 1597334677 % 4294967296 % 99901
                   AS ps_supplycost_cents
        FROM ps_base
    )
"""


def _eur_suppliers(spark, sf_dir):
    """Suppliers in region EUROPE with their nation name — a broadcast-
    sized dim at any SF (|supplier| is the smallest corpus table)."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )


_EUR_SQL = """
    eursupp AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    )
"""


@register(
    "tpch_q2_min_cost_supplier",
    oracle=f"""
        WITH {PARTSUPP_CTE}, {_EUR_SQL},
        cand AS (
            SELECT p.p_partkey, p.p_brand, e.s_name, e.s_acctbal, e.n_name,
                   ps.ps_supplycost_cents
            FROM part p
            JOIN partsupp ps ON p.p_partkey = ps.ps_partkey
            JOIN eursupp e ON ps.ps_suppkey = e.s_suppkey
            WHERE p.p_size BETWEEN 15 AND 17 AND p.p_type = 'MEDIUM'
        ),
        mins AS (
            SELECT p_partkey, MIN(ps_supplycost_cents) AS min_cents
            FROM cand GROUP BY p_partkey
        )
        SELECT c.s_acctbal, c.s_name, c.n_name, c.p_partkey, c.p_brand,
               CAST(c.ps_supplycost_cents AS DOUBLE) / 100 AS supplycost
        FROM cand c
        JOIN mins m ON c.p_partkey = m.p_partkey
                   AND c.ps_supplycost_cents = m.min_cents
    """,
    tags=("L-q2",),
)
def tpch_q2_min_cost_supplier(spark, sf_dir):
    """Q2 adapted: the cheapest EUROPE supplier(s) for each MEDIUM part
    of size 15-17 (p_brand stands in for the trimmed p_mfgr; the
    '%BRASS' type filter is restated over the surviving p_type values).
    The correlated MIN subquery is decorrelated the way Catalyst would:
    candidate rows grouped to per-part minima, joined back on
    (part, cost).  Both joins on the supplier side broadcast; the
    part-side filter prunes before partsupp is even built."""
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_size").between(15, 17) & (F.col("p_type") == "MEDIUM")
    )
    ps = derived_partsupp(spark, sf_dir)
    eur = _eur_suppliers(spark, sf_dir)
    cand = (
        part.join(ps, part.p_partkey == ps.ps_partkey)
        .join(F.broadcast(eur), ps.ps_suppkey == eur.s_suppkey)
        .select(
            "p_partkey", "p_brand", "s_name", "s_acctbal", "n_name",
            "ps_supplycost_cents",
        )
        .persist()  # feeds both the per-part minima and the join-back
    )
    mins = cand.groupBy("p_partkey").agg(
        F.min("ps_supplycost_cents").alias("min_cents")
    )
    c, m = cand.alias("c"), mins.alias("m")
    return (
        c.join(
            F.broadcast(m),
            (F.col("c.p_partkey") == F.col("m.p_partkey"))
            & (F.col("c.ps_supplycost_cents") == F.col("m.min_cents")),
        )
        .select(
            "c.s_acctbal", "c.s_name", "c.n_name", "c.p_partkey", "c.p_brand",
            (F.col("c.ps_supplycost_cents").cast("double") / 100).alias("supplycost"),
        )
    )


@register(
    "tpch_q11_part_value",
    oracle=f"""
        WITH {PARTSUPP_CTE}, {_EUR_SQL},
        grouped AS (
            SELECT ps_partkey,
                   CAST(SUM(ps_supplycost_cents * ps_availqty) AS DECIMAL(38,0))
                       AS value_cents
            FROM partsupp
            JOIN eursupp ON ps_suppkey = s_suppkey
            GROUP BY ps_partkey
        ),
        total AS (
            SELECT CAST(SUM(value_cents) AS DECIMAL(38,0)) AS tot,
                   CAST(COUNT(*) AS BIGINT) AS n_parts
            FROM grouped
        )
        SELECT ps_partkey,
               CAST(value_cents AS DOUBLE) / 100 AS part_value
        FROM grouped, total
        WHERE value_cents * n_parts > 2 * tot
    """,
    tags=("L-q11",),
)
def tpch_q11_part_value(spark, sf_dir):
    """Q11 adapted: inventory value (cost x availqty) held by EUROPE
    suppliers per part, keeping parts above 2x the MEAN part value —
    TPC-H's fixed 0.01%% fraction is defined relative to SF (the spec
    divides it by SF precisely so the result set stays populated as
    data grows); a mean-relative threshold is the scale-free
    equivalent and selects rows at every fixture SF.  The original's
    GERMANY nation filter widens to a region so the sf0.001 fixture,
    whose 10 suppliers leave some nations empty, still matches.  The
    HAVING threshold compares exact DECIMAL(38,0) integers —
    ``value*n_parts > 2*total`` — never a float fraction.  One shuffle
    for the per-part aggregate; the grand total is a 1-row
    broadcast."""
    ps = derived_partsupp(spark, sf_dir)
    eur = _eur_suppliers(spark, sf_dir).select("s_suppkey")
    grouped = (
        ps.join(F.broadcast(eur), ps.ps_suppkey == eur.s_suppkey)
        .groupBy("ps_partkey")
        .agg(
            F.sum(F.col("ps_supplycost_cents") * F.col("ps_availqty"))
            .cast("decimal(38,0)")
            .alias("value_cents")
        )
        .persist()  # feeds both the grand total and the HAVING filter
    )
    total = grouped.agg(
        F.sum("value_cents").cast("decimal(38,0)").alias("tot"),
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
    )
    return (
        grouped.crossJoin(F.broadcast(total))
        .where(F.col("value_cents") * F.col("n_parts") > 2 * F.col("tot"))
        .select(
            "ps_partkey",
            (F.col("value_cents").cast("double") / 100).alias("part_value"),
        )
    )


@register(
    "tpch_q16_supplier_counts",
    oracle=f"""
        WITH {PARTSUPP_CTE}
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT ps_suppkey) AS supplier_cnt
        FROM partsupp
        JOIN part ON ps_partkey = p_partkey
        WHERE p_brand <> 'Brand#4'
          AND p_type <> 'PROMO'
          AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34, 39, 44, 49)
          AND ps_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY p_brand, p_type, p_size
    """,
    tags=("L-q16",),
)
def tpch_q16_supplier_counts(spark, sf_dir):
    """Q16 adapted: distinct-supplier counts per (brand, type, size)
    excluding one brand, one type band and the original's
    complaint-suppliers — restated as negative account balance since
    s_comment was trimmed from the corpus.  NOT IN over a provably
    non-null key list = broadcast anti join (no null-check plan blowup);
    the distinct count is partial-aggregated under the single exchange."""
    ps = derived_partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#4")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin([1, 4, 9, 14, 19, 24, 29, 34, 39, 44, 49])
    )
    complaints = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        ps.join(F.broadcast(complaints), ps.ps_suppkey == complaints.s_suppkey, "left_anti")
        .join(part, ps.ps_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q20_potential_promotion",
    oracle=f"""
        WITH {PARTSUPP_CTE}, {_EUR_SQL},
        smallparts AS (
            SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
        ),
        shipped AS (
            SELECT l_partkey, l_suppkey,
                   SUM(CAST(l_quantity AS BIGINT)) AS qty
            FROM lineitem
            JOIN smallparts ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
            GROUP BY l_partkey, l_suppkey
        ),
        qualifying AS (
            SELECT DISTINCT ps.ps_suppkey
            FROM partsupp ps
            JOIN shipped sh ON ps.ps_partkey = sh.l_partkey
                           AND ps.ps_suppkey = sh.l_suppkey
            WHERE 2 * ps.ps_availqty > sh.qty
        )
        SELECT e.s_name, e.n_name
        FROM eursupp e
        WHERE e.s_suppkey IN (SELECT ps_suppkey FROM qualifying)
    """,
    tags=("L-q20",),
)
def tpch_q20_potential_promotion(spark, sf_dir):
    """Q20 adapted: EUROPE suppliers holding excess stock (availqty >
    half of 1996 shipments) of any 'small%' part.  The nested
    IN-with-correlated-scalar-subquery tower decorrelates to: lineitem
    aggregated once by (part, supplier) over the pruned part list,
    inner-joined to partsupp (reproducing the NULL-excludes-row
    semantics of the original scalar subquery), half-stock filter in
    exact integers (2*availqty > qty, l_quantity being integer-valued),
    then a semi join into the supplier dim.  lineitem is the only big
    table and is touched exactly once."""
    ps = derived_partsupp(spark, sf_dir)
    smallparts = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    shipped = (
        li.join(F.broadcast(smallparts), li.l_partkey == smallparts.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
    )
    qualifying = (
        ps.join(
            shipped,
            (ps.ps_partkey == shipped.l_partkey)
            & (ps.ps_suppkey == shipped.l_suppkey),
        )
        .where(F.lit(2) * F.col("ps_availqty") > F.col("qty"))
        .select("ps_suppkey")
        .distinct()
    )
    eur = _eur_suppliers(spark, sf_dir)
    return eur.join(
        F.broadcast(qualifying), eur.s_suppkey == qualifying.ps_suppkey, "left_semi"
    ).select("s_name", "n_name")


@register(
    "agg_days_of_supply",
    oracle=f"""
        WITH {PARTSUPP_CTE},
        onhand AS (
            SELECT ps_partkey, CAST(SUM(ps_availqty) AS BIGINT) AS avail
            FROM partsupp GROUP BY ps_partkey
        ),
        demand AS (
            SELECT l_partkey,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q365
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'
            GROUP BY l_partkey
        )
        SELECT p.p_brand AS brand,
               CAST(COUNT(*) AS BIGINT) AS n_parts,
               CAST(SUM(o.avail) AS BIGINT) AS total_onhand,
               CAST(SUM(d.q365) AS BIGINT) AS total_demand_365d,
               ROUND(CAST(SUM(o.avail) AS DOUBLE) * 365 / SUM(d.q365), 6)
                   AS days_of_supply,
               ROUND(CAST(SUM(d.q365) AS DOUBLE) / SUM(o.avail), 6)
                   AS annual_turnover
        FROM onhand o
        JOIN demand d ON d.l_partkey = o.ps_partkey
        JOIN part p ON p.p_partkey = o.ps_partkey
        GROUP BY p.p_brand
        ORDER BY brand
    """,
    tags=("L-inventory",),
)
def agg_days_of_supply(spark, sf_dir):
    """Days-of-supply / annual-turnover inventory table per brand:
    on-hand quantity (summed over the derived partsupp's four
    suppliers per part) against trailing-365-day lineitem demand —
    the inventory-turnover analytic the partsupp table exists for
    (completes the Q2/Q11/Q16/Q20 family with the operational view;
    on this corpus supply dwarfs annual demand, which the turnover
    column makes legible where a banded view would collapse).

    Exactness: availability and demand are exact BIGINT sums through
    the brand rollup; the two ratios are single float expressions
    rounded once.

    100 TB posture: partsupp derives from a projection of part (no
    shuffle to build), demand is one date-pruned map-side-combined
    aggregate, both join keys are partkey, and part's brand column
    broadcasts — at scale the written bucketed partsupp co-locates
    with a partkey-bucketed demand rollup, making the join
    shuffle-free."""
    ps = derived_partsupp(spark, sf_dir)
    onhand = ps.groupBy("ps_partkey").agg(
        F.sum("ps_availqty").cast("bigint").alias("avail")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    demand = li.groupBy("l_partkey").agg(
        F.sum(nan_to_null("l_quantity").cast("bigint")).cast("bigint").alias("q365")
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = (
        onhand.join(demand, onhand["ps_partkey"] == demand["l_partkey"])
        .join(F.broadcast(part), onhand["ps_partkey"] == part["p_partkey"])
    )
    return (
        j.groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum("avail").cast("bigint").alias("total_onhand"),
            F.sum("q365").cast("bigint").alias("total_demand_365d"),
        )
        .select(
            "brand",
            "n_parts",
            "total_onhand",
            "total_demand_365d",
            F.round(
                F.col("total_onhand").cast("double") * 365 / F.col("total_demand_365d"),
                6,
            ).alias("days_of_supply"),
            F.round(
                F.col("total_demand_365d").cast("double") / F.col("total_onhand"), 6
            ).alias("annual_turnover"),
        )
        .orderBy("brand")
    )
