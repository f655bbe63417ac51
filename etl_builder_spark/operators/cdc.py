"""Change-data-capture-style operators: snapshot diff, deterministic
surrogate keys, and SCD Type 2 interval construction — the remaining
classic ETL-builder patterns.

All three are expression-only single-shuffle constructs:
- diff = FULL OUTER on the key + per-column comparison,
- surrogate keys = content hash (md5 — portable across engines),
- SCD2 = change-detection lag + lead for the closing timestamp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_builder_spark.registry import register
from etl_builder_spark.session import load_table


def snapshot_diff(old: DataFrame, new: DataFrame, key: str, compare_cols: tuple[str, ...]) -> DataFrame:
    """Row-level diff of two snapshots: added / removed / changed /
    unchanged, one FULL OUTER join."""
    o = old.alias("o")
    n = new.alias("n")
    joined = o.join(n, F.col(f"o.{key}") == F.col(f"n.{key}"), "full")
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | (~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}")))
    status = (
        F.when(F.col(f"o.{key}").isNull(), "added")
        .when(F.col(f"n.{key}").isNull(), "removed")
        .when(changed, "changed")
        .otherwise("unchanged")
    )
    return joined.select(
        F.coalesce(F.col(f"o.{key}"), F.col(f"n.{key}")).alias(key),
        status.alias("diff_status"),
    )


@register(
    "cdc_snapshot_diff",
    oracle="""
        WITH old AS (SELECT * FROM orders WHERE o_orderkey % 7 <> 0),
        new AS (
            SELECT o_orderkey, o_custkey,
                   CASE WHEN o_orderkey % 5 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
                   o_totalprice, o_orderdate, o_orderpriority
            FROM orders WHERE o_orderkey % 3 <> 0
        )
        SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
               CASE WHEN o.o_orderkey IS NULL THEN 'added'
                    WHEN n.o_orderkey IS NULL THEN 'removed'
                    WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                      OR o.o_totalprice IS DISTINCT FROM n.o_totalprice THEN 'changed'
                    ELSE 'unchanged' END AS diff_status
        FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    """,
    tags=("ETL-cdc",),
)
def cdc_snapshot_diff(spark, sf_dir):
    """Diff two derived order snapshots (drop every 7th vs drop every
    3rd with status mutations on every 5th) → added/removed/changed/
    unchanged per key."""
    o = load_table(spark, sf_dir, "orders")
    old = o.where(F.col("o_orderkey") % 7 != 0)
    new = o.where(F.col("o_orderkey") % 3 != 0).withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 5 == 0, "X").otherwise(F.col("o_orderstatus")),
    )
    return snapshot_diff(old, new, "o_orderkey", ("o_orderstatus", "o_totalprice"))


@register(
    "etl_surrogate_keys",
    oracle="""
        SELECT o_orderkey,
               md5(concat_ws('|', CAST(o_custkey AS VARCHAR), o_orderstatus,
                             o_orderpriority)) AS dim_key,
               ROW_NUMBER() OVER (ORDER BY o_orderkey) AS seq_key
        FROM orders
        WHERE o_orderkey < 2000
    """,
    tags=("ETL-keys",),
)
def etl_surrogate_keys(spark, sf_dir):
    """Surrogate keys two ways: content-hash key (md5 over a delimited
    column tuple — portable, stable, collision-safe at warehouse
    scale) and a dense sequence key (row_number over a total order —
    the deterministic alternative to monotonically_increasing_id,
    which is partition-dependent and therefore banned by the policy).
    Sequence keys need a global order → bounded slice; hash keys are
    the 100 TB default."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 2000)
    w = Window.orderBy("o_orderkey")
    return o.select(
        "o_orderkey",
        F.md5(
            F.concat_ws(
                "|", F.col("o_custkey").cast("string"), "o_orderstatus", "o_orderpriority"
            )
        ).alias("dim_key"),
        F.row_number().over(w).alias("seq_key"),
    )


@register(
    "scd2_intervals",
    oracle="""
        WITH states AS (
            SELECT o_custkey, o_orderdate AS ts, o_orderpriority AS attr,
                   o_orderkey,
                   LAG(o_orderpriority) OVER w AS prev_attr
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ),
        changes AS (
            SELECT o_custkey, ts, attr, o_orderkey
            FROM states
            WHERE prev_attr IS NULL OR attr <> prev_attr
        )
        SELECT o_custkey, attr AS priority_state,
               ts AS valid_from,
               LEAD(ts) OVER (PARTITION BY o_custkey ORDER BY ts, o_orderkey) AS valid_to,
               (LEAD(ts) OVER (PARTITION BY o_custkey ORDER BY ts, o_orderkey) IS NULL)
                   AS is_current
        FROM changes
    """,
    tags=("ETL-scd2",),
)
def scd2_intervals(spark, sf_dir):
    """SCD Type 2: compress a per-key attribute timeline into validity
    intervals — change-detection lag keeps only transition rows, lead
    supplies the closing timestamp, NULL valid_to marks the current
    row. One window shuffle on the key."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    states = o.select(
        "o_custkey",
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderpriority").alias("attr"),
        "o_orderkey",
        F.lag("o_orderpriority").over(w).alias("prev_attr"),
    )
    changes = states.where(
        F.col("prev_attr").isNull() | (F.col("attr") != F.col("prev_attr"))
    )
    w2 = Window.partitionBy("o_custkey").orderBy("ts", "o_orderkey")
    lead_ts = F.lead("ts").over(w2)
    return changes.select(
        "o_custkey",
        F.col("attr").alias("priority_state"),
        F.col("ts").alias("valid_from"),
        lead_ts.alias("valid_to"),
        lead_ts.isNull().alias("is_current"),
    )


@register(
    "cdc_point_in_time_join",
    oracle="""
        WITH states AS (
            SELECT o_custkey, o_orderdate AS ts, o_orderpriority AS attr,
                   o_orderkey,
                   LAG(o_orderpriority) OVER w AS prev_attr
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ),
        changes AS (
            SELECT o_custkey, ts, attr, o_orderkey FROM states
            WHERE prev_attr IS NULL OR attr <> prev_attr
        ),
        dim AS (
            SELECT o_custkey, attr AS state, ts AS valid_from,
                   LEAD(ts) OVER (PARTITION BY o_custkey ORDER BY ts, o_orderkey)
                       AS valid_to
            FROM changes
        ),
        bounds AS (
            SELECT date_trunc('month', MIN(o_orderdate)) AS lo,
                   date_trunc('month', MAX(o_orderdate)) AS hi
            FROM orders
        ),
        probes AS (
            SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS probe_month
            FROM bounds
        )
        SELECT d.o_custkey, p.probe_month, d.state
        FROM dim d JOIN probes p
          ON p.probe_month >= d.valid_from
         AND (d.valid_to IS NULL OR p.probe_month < d.valid_to)
    """,
    tags=("ETL-pit",),
)
def cdc_point_in_time_join(spark, sf_dir):
    """Point-in-time dimension lookup — 'what was each customer's
    priority state AS OF each month start' — joined against the SCD2
    validity intervals (same construction as scd2_intervals).  This is
    the temporal-correctness join every feature store needs: training
    rows must see the dimension value valid AT the observation time,
    never a later one (leakage).

    Plan: the probe spine (a few dozen month starts) broadcasts and
    the join qualifies probe ∈ [valid_from, valid_to) per customer —
    each customer holds a handful of intervals, so the per-row
    interval scan is O(intervals) with no self-shuffle beyond the one
    window exchange that built the dimension.  At 100 TB, with a
    probe table too big to broadcast, this becomes the bucketed
    interval join of join_interval_bucketed (same predicate, bucketed
    by key)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    states = o.select(
        "o_custkey",
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderpriority").alias("attr"),
        "o_orderkey",
        F.lag("o_orderpriority").over(w).alias("prev_attr"),
    )
    changes = states.where(
        F.col("prev_attr").isNull() | (F.col("attr") != F.col("prev_attr"))
    )
    w2 = Window.partitionBy("o_custkey").orderBy("ts", "o_orderkey")
    dim = changes.select(
        "o_custkey",
        F.col("attr").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
    )
    bounds = o.agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("lo"),
        F.date_trunc("month", F.max("o_orderdate")).alias("hi"),
    )
    probes = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 MONTH"))).alias("probe_month")
    )
    return dim.crossJoin(F.broadcast(probes)).where(
        (F.col("probe_month") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("probe_month") < F.col("valid_to")))
    ).select("o_custkey", "probe_month", "state")


#: incremental SCD2 split: history is built from orders strictly before
#: this date; the change batch is exactly this year's orders
SCD2_CUTOFF = "1997-01-01"


@register(
    "etl_scd2_merge_incremental",
    oracle=f"""
        WITH hist_states AS (
            SELECT o_custkey, o_orderdate AS ts, o_orderpriority AS attr, o_orderkey,
                   LAG(o_orderpriority) OVER w AS prev_attr
            FROM orders WHERE o_orderdate < DATE '{SCD2_CUTOFF}'
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ),
        dim AS (
            SELECT o_custkey, attr AS state, ts AS valid_from,
                   LEAD(ts) OVER (PARTITION BY o_custkey ORDER BY ts, o_orderkey)
                       AS valid_to
            FROM hist_states
            WHERE prev_attr IS NULL OR attr <> prev_attr
        ),
        batch AS (
            -- the incoming change batch, reduced to one state change per
            -- (key, ts): deterministic first state by orderkey
            SELECT o_custkey,
                   MIN(o_orderdate) AS ts,
                   CAST(substr(MIN(printf('%010d', o_orderkey) || o_orderpriority), 11)
                        AS VARCHAR) AS new_state
            FROM orders WHERE o_orderdate >= DATE '{SCD2_CUTOFF}'
            GROUP BY o_custkey
        ),
        current_rows AS (SELECT * FROM dim WHERE valid_to IS NULL),
        closed_rows  AS (SELECT * FROM dim WHERE valid_to IS NOT NULL),
        merged AS (
            -- history rows pass through untouched
            SELECT o_custkey, state, valid_from, valid_to, 'history' AS row_kind
            FROM closed_rows
            UNION ALL
            -- current rows: closed by the batch if the state CHANGED,
            -- untouched otherwise
            SELECT c.o_custkey, c.state, c.valid_from,
                   CASE WHEN b.o_custkey IS NOT NULL AND b.new_state <> c.state
                        THEN b.ts END AS valid_to,
                   CASE WHEN b.o_custkey IS NOT NULL AND b.new_state <> c.state
                        THEN 'closed_by_batch' ELSE 'still_current' END AS row_kind
            FROM current_rows c LEFT JOIN batch b ON b.o_custkey = c.o_custkey
            UNION ALL
            -- new current rows opened by the batch (changed or brand-new key)
            SELECT b.o_custkey, b.new_state, b.ts, NULL, 'opened_by_batch'
            FROM batch b LEFT JOIN current_rows c ON c.o_custkey = b.o_custkey
            WHERE c.o_custkey IS NULL OR b.new_state <> c.state
        )
        SELECT o_custkey, state, valid_from, valid_to, row_kind FROM merged
    """,
    tags=("ETL-scd2-merge",),
)
def etl_scd2_merge_incremental(spark, sf_dir):
    """INCREMENTAL SCD2 maintenance — the nightly-merge shape: apply a
    change batch to an EXISTING dimension without rebuilding history.
    Closed intervals pass through untouched; each key's current row is
    end-dated only if the batch carries a different state; changed or
    brand-new keys open a new current row.  This is the operational
    twin of scd2_intervals (which rebuilds from the full timeline) —
    at 100 TB you never re-window years of history for a day's
    changes: the merge touches |current rows| + |batch|, both
    partitioned on the business key, history is append-only.  Batch
    reduction picks each key's first incoming state deterministically
    (padded orderkey argmin); `row_kind` makes the merge auditable
    (history / still_current / closed_by_batch / opened_by_batch)."""
    o = load_table(spark, sf_dir, "orders")
    cutoff = F.lit(SCD2_CUTOFF).cast("date")

    hist = o.where(F.col("o_orderdate") < cutoff)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    states = hist.select(
        "o_custkey",
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderpriority").alias("attr"),
        "o_orderkey",
        F.lag("o_orderpriority").over(w).alias("prev_attr"),
    )
    changes = states.where(
        F.col("prev_attr").isNull() | (F.col("attr") != F.col("prev_attr"))
    )
    w2 = Window.partitionBy("o_custkey").orderBy("ts", "o_orderkey")
    # persisted: three consumers (history, current-merge, opened-rows)
    # would each re-derive the full lag/lead window pipeline over the
    # history scan (5 source scans — round-5 multi-scan plan audit);
    # at scale this is the existing dimension table read once
    dim = changes.select(
        "o_custkey",
        F.col("attr").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
    ).persist()

    batch = (
        o.where(F.col("o_orderdate") >= cutoff)
        .groupBy("o_custkey")
        .agg(
            F.min("o_orderdate").alias("ts"),
            F.substring(
                F.min(
                    F.concat(
                        F.format_string("%010d", F.col("o_orderkey")),
                        F.col("o_orderpriority"),
                    )
                ),
                11,
                100,
            ).alias("new_state"),
        )
        .persist()  # joined against current twice (close + open legs)
    )

    current = dim.where(F.col("valid_to").isNull()).alias("c")
    closed = dim.where(F.col("valid_to").isNotNull())
    b = batch.alias("b")

    history = closed.select(
        "o_custkey", "state", "valid_from", "valid_to", F.lit("history").alias("row_kind")
    )
    changed = F.col("b.o_custkey").isNotNull() & (F.col("b.new_state") != F.col("c.state"))
    curr_merged = current.join(b, F.col("b.o_custkey") == F.col("c.o_custkey"), "left").select(
        F.col("c.o_custkey").alias("o_custkey"),
        F.col("c.state").alias("state"),
        F.col("c.valid_from").alias("valid_from"),
        F.when(changed, F.col("b.ts")).alias("valid_to"),
        F.when(changed, "closed_by_batch").otherwise("still_current").alias("row_kind"),
    )
    opened = (
        b.join(current, F.col("c.o_custkey") == F.col("b.o_custkey"), "left")
        .where(F.col("c.o_custkey").isNull() | (F.col("b.new_state") != F.col("c.state")))
        .select(
            F.col("b.o_custkey").alias("o_custkey"),
            F.col("b.new_state").alias("state"),
            F.col("b.ts").alias("valid_from"),
            F.lit(None).cast("date").alias("valid_to"),
            F.lit("opened_by_batch").alias("row_kind"),
        )
    )
    return history.unionByName(curr_merged).unionByName(opened)


#: bitemporal fixture: the valid-time point query date
BITEMPORAL_V = "1996-06-30"


@register(
    "scd2_bitemporal_asof",
    oracle=f"""
        WITH txs AS (SELECT unnest(range(1, 3)) AS tx_version),
        visible AS (
            SELECT t.tx_version, o.o_custkey, o.o_orderdate, o.o_orderkey,
                   o.o_orderpriority AS state
            FROM orders o CROSS JOIN txs t
            WHERE (o.o_orderkey % 2 = 0 OR t.tx_version = 2)
              AND o.o_orderdate <= DATE '{BITEMPORAL_V}'
        ),
        ranked AS (
            SELECT tx_version, o_custkey, state, o_orderdate,
                   ROW_NUMBER() OVER (PARTITION BY tx_version, o_custkey
                                      ORDER BY o_orderdate DESC, o_orderkey DESC)
                       AS rn
            FROM visible
        )
        SELECT CAST(tx_version AS INT) AS tx_version, o_custkey,
               state, o_orderdate AS state_since
        FROM ranked WHERE rn = 1
    """,
    tags=("CDC-bitemporal",),
)
def scd2_bitemporal_asof(spark, sf_dir):
    """BITEMPORAL point query — two independent time axes: "what was
    each customer's state AS OF valid time V (=1996-06-30), AS
    KNOWN AT transaction version T" for T ∈ {1, 2}.  Transaction 1
    loaded only the even orderkeys; transaction 2 backfilled the
    rest — so the SAME valid-time question gets DIFFERENT answers per
    tx version wherever the backfill revealed a later order.  This is
    the reproducibility contract regulated reporting and ML training
    need: re-running a report "as we knew it then" must ignore data
    that arrived later, which a single-axis SCD2 (scd2_intervals)
    cannot express.

    The per-(tx, key) latest visible state is a de-windowed
    max(struct(valid_ts, unique_key, state)) — map-side combine, no
    sort of the ×|tx| expansion (VERDICT r4 item 4 shape).

    100 TB posture: tx visibility is a PREDICATE on an append-only
    batch-id column — no data rewritten per version, the ×|versions|
    expansion only materializes queried versions, and everything
    shuffles once on (tx, key).  Production keeps batch_id in the
    layout (partition column) so one version's query prunes to its
    batches."""
    o = load_table(spark, sf_dir, "orders")
    txs = spark.range(1, 3).select(F.col("id").cast("int").alias("tx_version"))
    visible = (
        o.crossJoin(F.broadcast(txs))
        .where(
            ((F.col("o_orderkey") % 2 == 0) | (F.col("tx_version") == 2))
            & (F.col("o_orderdate") <= F.lit(BITEMPORAL_V).cast("timestamp"))
        )
        .select("tx_version", "o_custkey", "o_orderdate", "o_orderkey", F.col("o_orderpriority").alias("state"))
    )
    latest = (
        visible.groupBy("tx_version", "o_custkey")
        .agg(F.max(F.struct("o_orderdate", "o_orderkey", "state")).alias("m"))
    )
    return latest.select(
        "tx_version",
        "o_custkey",
        F.col("m.state").alias("state"),
        F.col("m.o_orderdate").alias("state_since"),
    )


@register(
    "etl_erasure_footprint",
    oracle="""
        WITH req AS (
            SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0
        ),
        ord AS (
            SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders
            WHERE o_custkey IN (SELECT c_custkey FROM req)
            GROUP BY o_custkey
        ),
        li AS (
            SELECT o.o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS n_lineitems
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE o.o_custkey IN (SELECT c_custkey FROM req)
            GROUP BY o.o_custkey
        )
        SELECT r.c_custkey,
               COALESCE(ord.n_orders, 0) AS n_orders,
               COALESCE(li.n_lineitems, 0) AS n_lineitems,
               1 + COALESCE(ord.n_orders, 0) + COALESCE(li.n_lineitems, 0)
                   AS total_rows
        FROM req r
        LEFT JOIN ord ON ord.k = r.c_custkey
        LEFT JOIN li ON li.k = r.c_custkey
    """,
    tags=("ETL-erasure",),
)
def etl_erasure_footprint(spark, sf_dir):
    """Erasure-request blast radius (the GDPR/CCPA delete-cascade
    audit): for each customer on a deterministic request list, count
    every row that a cascading delete would have to touch — the
    customer row itself, their orders, and those orders' line items —
    INCLUDING zero-footprint requesters (left joins), because "we
    found nothing to delete" is itself a compliance answer.  Run
    before the delete as the work estimate, after it as the proof of
    completion (all-zero footprints).

    100 TB posture: each child table is SEMI-JOIN filtered by the
    (tiny, broadcast) request list BEFORE its per-customer rollup, so
    the fact scans reduce to the requesters' slivers and the counts
    are map-side combined; the final assembly joins three
    request-sized frames.  Adding a table to the audit adds one
    filtered rollup, never a wider join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    req = c.where(F.col("c_custkey") % 97 == 0).select("c_custkey")
    ord_n = (
        o.join(F.broadcast(req), o.o_custkey == req.c_custkey, "left_semi")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
    )
    li_n = (
        o.join(F.broadcast(req), o.o_custkey == req.c_custkey, "left_semi")
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_lineitems"))
    )
    return (
        req.join(ord_n, req.c_custkey == ord_n.k, "left")
        .join(li_n, req.c_custkey == li_n.k, "left")
        .select(
            "c_custkey",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("n_lineitems", F.lit(0)).alias("n_lineitems"),
            (
                F.lit(1)
                + F.coalesce("n_orders", F.lit(0))
                + F.coalesce("n_lineitems", F.lit(0))
            ).alias("total_rows"),
        )
    )


@register(
    "etl_scd3_previous_value",
    oracle="""
        WITH old AS (SELECT * FROM orders WHERE o_orderkey % 7 <> 0),
        new AS (
            SELECT o_orderkey, o_custkey,
                   CASE WHEN o_orderkey % 5 = 0 THEN 'X' ELSE o_orderstatus END
                       AS o_orderstatus,
                   o_totalprice, o_orderdate, o_orderpriority
            FROM orders WHERE o_orderkey % 3 <> 0
        )
        SELECT n.o_orderkey,
               n.o_orderstatus AS current_status,
               CASE WHEN o.o_orderkey IS NOT NULL
                         AND o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                    THEN o.o_orderstatus END AS previous_status,
               (o.o_orderkey IS NOT NULL
                AND o.o_orderstatus IS DISTINCT FROM n.o_orderstatus)
                   AS status_changed,
               o.o_orderkey IS NULL AS is_new_key
        FROM new n LEFT JOIN old o ON o.o_orderkey = n.o_orderkey
    """,
    tags=("ETL-scd3",),
)
def etl_scd3_previous_value(spark, sf_dir):
    """SCD Type 3 — previous-value column maintenance, completing the
    slowly-changing-dimension family next to SCD2 intervals
    (``scd2_intervals``), incremental SCD2 merge and the bitemporal
    as-of: the new snapshot keeps ONE generation of history IN-ROW
    (current_status + previous_status), the pattern for dimensions
    where only "what changed since last load" matters and row
    explosion is unwanted.  Reuses cdc_snapshot_diff's derived
    old/new fixture; null-safe change detection (IS DISTINCT FROM) so
    NULL→value transitions record correctly; brand-new keys carry a
    NULL previous with is_new_key set.

    100 TB posture: one equi-join on the dimension key (broadcast
    while the dim is small, shuffle under AQE as it grows) and a
    projection — no window, no history table scan; the in-row history
    means the nightly merge touches only the delta keys when combined
    with the dynamic-partition-overwrite write path (A4d)."""
    o = load_table(spark, sf_dir, "orders")
    old = o.where(F.col("o_orderkey") % 7 != 0).select(
        F.col("o_orderkey").alias("k"), F.col("o_orderstatus").alias("old_status")
    )
    new = o.where(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 5 == 0, "X")
        .otherwise(F.col("o_orderstatus"))
        .alias("current_status"),
    )
    j = new.join(old, new["o_orderkey"] == old["k"], "left")
    changed = F.col("k").isNotNull() & ~F.col("old_status").eqNullSafe(
        F.col("current_status")
    )
    return j.select(
        "o_orderkey",
        "current_status",
        F.when(changed, F.col("old_status")).alias("previous_status"),
        changed.alias("status_changed"),
        F.col("k").isNull().alias("is_new_key"),
    )
