"""C. Joins (SURVEY.md §2 C1-C8, C11; C9/C10 live in asof.py).

The engine exposes *logical* join types and lets Catalyst + AQE pick
the physical algorithm (broadcast-hash / shuffled-hash / sort-merge /
nested-loop). Explicit ``F.broadcast`` pins the small-dim cases so the
plan is broadcast even if stats mis-estimate — at 100 TB the fact side
never shuffles for a dimension join. AQE skew-join splitting handles
hot keys on the shuffled joins.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_builder_spark.policy import money
from etl_builder_spark.registry import register
from etl_builder_spark.session import load_table


@register(
    "join_inner_equi",
    oracle="""
        SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderstatus = 'F'
    """,
    tags=("C1",),
)
def join_inner_equi(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o["o_custkey"] == c["c_custkey"], "inner").select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@register(
    "join_broadcast",
    oracle="""
        SELECT l_orderkey, l_linenumber, p_brand, p_size,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_size >= 40
    """,
    tags=("C2",),
)
def join_broadcast(spark, sf_dir):
    """Broadcast hash join pinned with an explicit hint: the part dim
    ships to every executor; the lineitem fact side never shuffles."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_size") >= 40)
    return l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"]).select(
        "l_orderkey",
        "l_linenumber",
        "p_brand",
        "p_size",
        (money("l_extendedprice") * (F.lit(1) - money("l_discount"))).cast("double").alias("revenue"),
    )


@register(
    "join_left_outer",
    oracle="""
        SELECT c_custkey, c_mktsegment, COUNT(o.o_orderkey) AS n_big_orders
        FROM customer
        LEFT JOIN (SELECT * FROM orders WHERE o_totalprice >= 400000) o
          ON o.o_custkey = c_custkey
        GROUP BY c_custkey, c_mktsegment
    """,
    tags=("C3",),
)
def join_left_outer(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") >= 400000)
    return (
        c.join(o, o["o_custkey"] == c["c_custkey"], "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.count("o_orderkey").alias("n_big_orders"))
    )


@register(
    "join_full_outer",
    oracle="""
        WITH a AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'),
             b AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'F')
        SELECT COALESCE(a.k, b.k) AS custkey,
               (a.k IS NOT NULL) AS has_open,
               (b.k IS NOT NULL) AS has_filled
        FROM a FULL OUTER JOIN b ON a.k = b.k
    """,
    tags=("C4",),
)
def join_full_outer(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("ka")).distinct()
    b = o.where(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("kb")).distinct()
    return a.join(b, a["ka"] == b["kb"], "full").select(
        F.coalesce("ka", "kb").alias("custkey"),
        F.col("ka").isNotNull().alias("has_open"),
        F.col("kb").isNotNull().alias("has_filled"),
    )


@register(
    "join_semi",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    """,
    tags=("C5",),
)
def join_semi(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
        SELECT p_partkey, p_brand
        FROM part
        WHERE NOT EXISTS (SELECT 1 FROM lineitem
                          WHERE l_partkey = p_partkey AND l_quantity >= 45)
    """,
    tags=("C6",),
)
def join_anti(spark, sf_dir):
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 45)
    return p.join(l, p["p_partkey"] == l["l_partkey"], "left_anti").select("p_partkey", "p_brand")


@register(
    "join_cross_small",
    oracle="""
        SELECT n_name, r_name, (n_regionkey = r_regionkey) AS is_home
        FROM nation CROSS JOIN region
    """,
    tags=("C7",),
)
def join_cross_small(spark, sf_dir):
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return n.crossJoin(r).select(
        "n_name", "r_name", (F.col("n_regionkey") == F.col("r_regionkey")).alias("is_home")
    )


@register(
    "join_theta_range",
    oracle="""
        SELECT o_orderpriority,
               COUNT(*) AS n_late,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS late_value
        FROM lineitem JOIN orders
          ON l_orderkey = o_orderkey
         AND l_shipdate > o_orderdate + INTERVAL 120 DAY
        GROUP BY o_orderpriority
    """,
    tags=("C8",),
)
def join_theta_range(spark, sf_dir):
    """Theta join = equi key + range residual: Catalyst plans the equi
    part as a hash/sort-merge join and evaluates the range predicate as
    a post-join filter — no nested-loop blowup at scale."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    cond = (l["l_orderkey"] == o["o_orderkey"]) & (
        l["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 120 DAYS")
    )
    return (
        l.join(o, cond)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_late"),
            F.sum(money("l_extendedprice")).cast("double").alias("late_value"),
        )
    )


@register(
    "join_multiway_star",
    oracle="""
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY n_name
    """,
    tags=("C11",),
)
def join_multiway_star(spark, sf_dir):
    """TPC-H Q5-shape 5-way star join. Dim tables (supplier, nation,
    region) broadcast; the orders/lineitem join is the only real
    shuffle, and the date filter prunes orders before it."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(l, l["l_orderkey"] == o["o_orderkey"])
        .join(
            F.broadcast(s),
            (l["l_suppkey"] == s["s_suppkey"]) & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(
            F.sum(money("l_extendedprice") * (F.lit(1) - money("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "join_null_safe",
    oracle="""
        WITH lo as (
            SELECT NULLIF(o_orderstatus, 'P') AS status_key,
                   COUNT(*) AS n_even
            FROM orders WHERE o_orderkey % 2 = 0
            GROUP BY 1
        ),
        hi AS (
            SELECT NULLIF(o_orderstatus, 'P') AS status_key,
                   COUNT(*) AS n_odd
            FROM orders WHERE o_orderkey % 2 = 1
            GROUP BY 1
        )
        SELECT COALESCE(lo.status_key, hi.status_key) AS status_key,
               (lo.status_key IS NULL AND hi.status_key IS NULL) AS is_null_group,
               lo.n_even, hi.n_odd
        FROM lo FULL JOIN hi
          ON lo.status_key IS NOT DISTINCT FROM hi.status_key
    """,
    tags=("C-nullsafe",),
)
def join_null_safe(spark, sf_dir):
    """Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM): the
    two parity halves of orders aggregated on a NULLABLE key
    (NULLIF collapses 'P' to NULL) and full-outer-joined null-safely —
    the NULL groups MATCH each other instead of producing two dangling
    rows, which is exactly the semantic difference from ``=`` (and a
    classic silent-bug source in snapshot reconciliation).  eqNullSafe
    keys still hash-partition like plain equality — same single
    exchange, no plan penalty."""
    o = load_table(spark, sf_dir, "orders")
    key = F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_key")
    lo = (
        o.where(F.col("o_orderkey") % 2 == 0)
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_even"))
        .alias("lo")
    )
    hi = (
        o.where(F.col("o_orderkey") % 2 == 1)
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_odd"))
        .alias("hi")
    )
    return lo.join(
        hi, F.col("lo.status_key").eqNullSafe(F.col("hi.status_key")), "full"
    ).select(
        F.coalesce(F.col("lo.status_key"), F.col("hi.status_key")).alias("status_key"),
        (F.col("lo.status_key").isNull() & F.col("hi.status_key").isNull()).alias(
            "is_null_group"
        ),
        "n_even",
        "n_odd",
    )


@register(
    "join_latest_dim_snapshot",
    oracle="""
        WITH latest AS (
            SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority, o_totalprice
            FROM (
                SELECT o.*,
                       ROW_NUMBER() OVER (
                           PARTITION BY o_custkey
                           ORDER BY o_orderdate DESC, o_orderkey DESC
                       ) AS rn
                FROM orders o
            )
            WHERE rn = 1
        )
        SELECT c.c_custkey, c.c_name, c.c_mktsegment,
               l.o_orderkey AS latest_orderkey,
               l.o_orderdate AS latest_orderdate,
               l.o_orderpriority AS latest_priority,
               l.o_totalprice AS latest_totalprice
        FROM customer c
        JOIN latest l ON l.o_custkey = c.c_custkey
    """,
    tags=("C-latest",),
)
def join_latest_dim_snapshot(spark, sf_dir):
    """Latest-record-per-key join — the mutable-dimension staple: a
    versioned table (here, each order as a customer-state version) is
    reduced to its newest row per key (WindowGroupLimit top-1, ties
    pinned on the unique key) and joined to the entity table.  This is
    the cheap point-read twin of cdc_point_in_time_join: AS OF *now*
    needs only the top-1 window, no interval logic.  The window and
    the join share the customer key, so after the window's exchange
    the join is co-partitioned (or broadcasts — the reduced dim is one
    row per key, always the smallest it can be)."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    latest = (
        o.select("*", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority", "o_totalprice")
    )
    return c.join(latest, latest.o_custkey == c.c_custkey).select(
        "c_custkey",
        "c_name",
        "c_mktsegment",
        F.col("o_orderkey").alias("latest_orderkey"),
        F.col("o_orderdate").alias("latest_orderdate"),
        F.col("o_orderpriority").alias("latest_priority"),
        F.col("o_totalprice").alias("latest_totalprice"),
    )


@register(
    "join_temporal_overlap_pairs",
    oracle="""
        WITH ordered AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                             OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                        THEN 1 ELSE 0 END AS is_start
            FROM events WHERE user_id < 50
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT user_id, ts,
                   SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS seq
            FROM ordered
        ),
        iv AS (
            SELECT user_id, seq,
                   epoch_us(MIN(ts)) AS s_us, epoch_us(MAX(ts)) AS e_us
            FROM sess GROUP BY user_id, seq
        )
        SELECT a.user_id AS user_a, b.user_id AS user_b,
               COUNT(*) AS n_overlaps
        FROM iv a JOIN iv b
          ON a.user_id < b.user_id
         AND a.s_us < b.e_us AND b.s_us < a.e_us
        GROUP BY 1, 2
    """,
    tags=("C-overlap",),
)
def join_temporal_overlap_pairs(spark, sf_dir):
    """Interval-OVERLAP join: pairs of sessions (different users) that
    were live at the same time — concurrency analysis, co-presence
    detection, double-billing audits.  Distinct from the
    point-in-interval family (C9): BOTH sides are intervals and the
    predicate is symmetric overlap (a.start < b.end ∧ b.start <
    a.end), which no equi-join expresses directly.  The scale shape:
    explode each interval into the HOUR buckets it spans, equi-join
    on the bucket, dedup pair candidates, verify exact overlap — the
    same bucket-then-verify contract as join_interval_bucketed and
    the grid spatial join, with candidates bounded by per-bucket
    concurrency instead of |A|·|B|.  The oracle runs the quadratic
    brute force on a bounded user slice, so hash equality proves the
    bucketed rewrite loses no pair (zero-length single-event sessions
    overlap nothing under the strict inequalities — deterministic on
    both engines).

    100 TB posture: one sessionize pass (user-key window), one
    explode bounded by session length / bucket width, one equi-join
    shuffle on the bucket key; a pathological always-on session spans
    many buckets — cap session length or widen buckets (the classic
    interval-join granularity tradeoff, documented at
    operators/asof.py)."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").where(F.col("user_id") < 50)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    prev = F.lag(us).over(w)
    is_start = F.when(prev.isNull() | ((us - prev) > 1_800_000_000), 1).otherwise(0)
    sess = e.select(
        "user_id",
        "ts",
        "event_id",
        is_start.alias("is_start"),
    ).select(
        "user_id",
        "ts",
        F.sum("is_start")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("seq"),
    )
    iv = (
        sess.groupBy("user_id", "seq")
        .agg(
            F.unix_micros(F.min("ts")).alias("s_us"),
            F.unix_micros(F.max("ts")).alias("e_us"),
        )
        .persist()  # both sides of the bucketed self-join
    )
    hour_us = 3_600_000_000
    buck = iv.select(
        "user_id",
        "seq",
        "s_us",
        "e_us",
        F.explode(
            F.sequence(F.floor(F.col("s_us") / hour_us), F.floor(F.col("e_us") / hour_us))
        ).alias("bucket"),
    )
    a, b = buck.alias("a"), buck.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .where((F.col("a.s_us") < F.col("b.e_us")) & (F.col("b.s_us") < F.col("a.e_us")))
        .select(
            F.col("a.user_id").alias("user_a"),
            F.col("a.seq").alias("seq_a"),
            F.col("b.user_id").alias("user_b"),
            F.col("b.seq").alias("seq_b"),
        )
        .distinct()
    )
    return pairs.groupBy("user_a", "user_b").agg(F.count(F.lit(1)).alias("n_overlaps"))


def _bloom_probe_sql(key: str, masks_prefix: str) -> str:
    """AND-of-4-depths Bloom membership expression over the pivoted
    16-word mask row (engine-neutral: CASE + shifts + bit AND)."""
    from etl_builder_spark.functions.sketches import BLOOM_M, CM_P, CM_PERMS

    tests = []
    for d, (a, b) in enumerate(CM_PERMS):
        bit = f"(({a} * {key} + {b}) % {CM_P} % {BLOOM_M})"
        word = " ".join(
            f"WHEN {w} THEN {masks_prefix}{d}_{w}" for w in range(BLOOM_M // 64)
        )
        sel = f"CASE ({bit}) div 64 {word} END"
        tests.append(f"(shiftright({sel}, CAST({bit} % 64 AS INT)) & 1) = 1")
    return " AND ".join(tests)


@register(
    "join_bloom_prefiltered",
    oracle="""
        SELECT s.s_suppkey, s.s_name,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS revenue
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE n.n_nationkey < 8
        GROUP BY s.s_suppkey, s.s_name
    """,
    tags=("C-bloom",),
)
def join_bloom_prefiltered(spark, sf_dir):
    """Runtime Bloom-filter pre-join: the filtered supplier dim builds
    a 256-bit exact Bloom (the sketch_bloom_exact hash family) that is
    PIVOTED into one 16-word row, broadcast, and applied to lineitem
    as a pure EXPRESSION before the join — the hand-rolled version of
    the runtime row-group/semi-join filters engines inject around big
    joins, with the no-false-negative property PROVEN every round:
    the oracle is the plain join, so hash equality certifies the
    prefilter dropped only rows the join would drop anyway (false
    positives are harmlessly re-dropped by the join itself).

    100 TB posture: the filter costs one broadcast of 16 BIGINTs and
    4 integer hashes per fact row INSIDE the scan's codegen stage —
    rows that fail never reach the join exchange, which is the whole
    point when the dim filter is selective; the dim side is
    broadcast, so the join itself is shuffle-free."""
    from etl_builder_spark.functions.sketches import BLOOM_M, CM_P, CM_PERMS

    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    dim = (
        s.join(F.broadcast(n.where(F.col("n_nationkey") < 8)), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
        .persist()
    )
    perms = spark.createDataFrame(
        [(d, a, b) for d, (a, b) in enumerate(CM_PERMS)], "d long, a long, b long"
    )
    bit = F.pmod(
        F.pmod(F.col("a") * F.col("s_suppkey") + F.col("b"), F.lit(CM_P)), F.lit(BLOOM_M)
    )
    words = (
        dim.crossJoin(F.broadcast(perms))
        .select("d", bit.alias("bit"))
        .select("d", F.floor(F.col("bit") / 64).cast("long").alias("w"),
                F.expr("shiftleft(1L, CAST(bit % 64 AS INT))").alias("m"))
        .groupBy("d", "w")
        .agg(F.expr("bit_or(m)").alias("mask"))
    )
    masks_row = words.agg(
        *[
            F.coalesce(
                F.max(F.when((F.col("d") == d) & (F.col("w") == w), F.col("mask"))),
                F.lit(0).cast("long"),
            ).alias(f"mask_{d}_{w}")
            for d in range(len(CM_PERMS))
            for w in range(BLOOM_M // 64)
        ]
    )
    probe = _bloom_probe_sql("l_suppkey", "mask_")
    filtered = l.crossJoin(F.broadcast(masks_row)).where(F.expr(probe))
    from etl_builder_spark.policy import money

    return (
        filtered.join(F.broadcast(dim), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.sum(money("l_extendedprice")).cast("double").alias("revenue"),
        )
    )
