"""Histogram binning + conditional frame windows — common analytics
shapes composed from exact primitives.

Binning uses the explicit floor formula on both engines rather than
each engine's width_bucket builtin (whose boundary behaviors differ) —
policy §7.2.7: same formulation both sides beats same-named builtins.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_builder_spark.registry import register
from etl_builder_spark.session import load_table


@register(
    "agg_histogram",
    oracle="""
        WITH binned AS (
            -- NaN pin (r13): an undefined total has no bin — NULL bin
            -- on both engines (DuckDB floor(NaN)=NaN and least() would
            -- otherwise NaN-absorb into the top bin; Spark diverges)
            SELECT CASE WHEN isnan(o_totalprice) THEN NULL
                        ELSE least(CAST(floor((o_totalprice - 0) / 50000) AS BIGINT), 9)
                   END AS bin
            FROM orders
        )
        SELECT bin,
               bin * 50000.0 AS bin_lo,
               (bin + 1) * 50000.0 AS bin_hi,
               COUNT(*) AS n
        FROM binned
        GROUP BY bin
    """,
    tags=("AN-histogram",),
)
def agg_histogram(spark, sf_dir):
    """10-bin histogram of order totals (0..500k, top bin clamps).
    floor((x-lo)/step) on exact 2-dp doubles is the identical IEEE
    expression on both engines — no width_bucket dialect risk.  An
    undefined (NaN) total has no bin: nan_to_null → the NULL bin,
    matching the oracle's isnan guard (round 13)."""
    o = load_table(spark, sf_dir, "orders")
    raw_bin = F.least(F.floor((F.col("o_totalprice") - 0) / 50000), F.lit(9)).cast(
        "long"
    )
    # when-guard, not nan_to_null-into-least: least() SKIPS NULLs on
    # both engines, so a NULLed input would land in the top bin instead
    # of the NULL bin the oracle's CASE emits
    bin_ = F.when(~F.isnan("o_totalprice"), raw_bin)
    return (
        o.select(bin_.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin",
            (F.col("bin") * 50000.0).alias("bin_lo"),
            ((F.col("bin") + 1) * 50000.0).alias("bin_hi"),
            "n",
        )
    )


@register(
    "win_conditional_rows",
    oracle="""
        SELECT event_id, user_id, event_type,
               COUNT(*) FILTER (WHERE event_type = 'purchase') OVER w AS purchases_in_last5,
               CAST(SUM(CAST(value AS DECIMAL(18,2)))
                    FILTER (WHERE event_type = 'purchase') OVER w AS DOUBLE) AS purchase_value_last5
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
    tags=("E-conditional",),
)
def win_conditional_rows(spark, sf_dir):
    """Conditional aggregate over a trailing ROWS frame: purchases
    among each user's last 5 events — frame + FILTER composition
    (Spark spells FILTER as sum/count of CASE WHEN)."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, 0)
    )
    is_p = F.col("event_type") == "purchase"
    return e.select(
        "event_id",
        "user_id",
        "event_type",
        F.count(F.when(is_p, F.lit(1))).over(w).alias("purchases_in_last5"),
        F.sum(F.when(is_p, F.col("value").cast("decimal(18,2)")))
        .over(w)
        .cast("double")
        .alias("purchase_value_last5"),
    )


#: equi-depth bin count
EQD_BINS = 10


@register(
    "agg_equidepth_histogram",
    oracle=f"""
        WITH vals AS (
            SELECT o_totalprice AS v, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM orders
            -- complete-case: NULL prices are not observations (r12)
            WHERE o_totalprice IS NOT NULL
            GROUP BY 1
        ),
        run AS (
            SELECT v, cnt, SUM(cnt) OVER (ORDER BY v) AS run_cnt
            FROM vals
        ),
        tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM vals),
        grid AS (SELECT i FROM generate_series(1, {EQD_BINS}) t(i)),
        edges AS (
            SELECT i,
                   MIN(CASE WHEN run_cnt >= (i * n + {EQD_BINS} - 1) // {EQD_BINS}
                            THEN v END) AS upper_edge,
                   CAST(MIN(CASE WHEN run_cnt >= (i * n + {EQD_BINS} - 1) // {EQD_BINS}
                                 THEN run_cnt END) AS BIGINT) AS cum_rows
            FROM run CROSS JOIN tot CROSS JOIN grid
            GROUP BY i
        )
        SELECT CAST(i AS BIGINT) AS bin,
               upper_edge,
               cum_rows,
               CAST(cum_rows - COALESCE(LAG(cum_rows) OVER (ORDER BY i), 0) AS BIGINT)
                   AS bin_rows
        FROM edges
    """,
    tags=("D-histogram",),
)
def agg_equidepth_histogram(spark, sf_dir):
    """Equi-depth (equal-frequency) histogram of o_totalprice in
    {EQD_BINS} bins — the optimizer-statistics shape (NDV-aware
    selectivity estimation builds exactly this): bin i's upper edge is
    the smallest value whose inclusive running count reaches
    ceil(i·N/{EQD_BINS}), so every bin holds ~N/{EQD_BINS} rows with
    ties kept together.  Edges and counts are EXACT — no interpolation,
    no sketch (the D10/D13 keys cover those); integer rank targets use
    the ceil-division identity (i·N + k−1) div k.

    100 TB posture: the per-DISTINCT-value frame (one hash aggregate)
    is the only row-count-sized stage; the running count uses the
    banded prefix machinery (zero unpartitioned Windows), the ×{EQD_BINS}
    grid expansion collapses inside map-side combine (the stump-scan
    shape), and the lag step runs on {EQD_BINS} rows."""
    from etl_builder_spark.operators.stats import banded_running

    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice").isNotNull()  # complete-case (r12)
    )
    vals = (
        o.groupBy(F.col("o_totalprice").alias("v"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .persist()  # feeds the total, and banded_running scans it twice
    )
    run = banded_running(vals, value_col="v", tiebreak_col="v", sum_col="cnt").select(
        "v", F.col("run_sum").alias("run_cnt")
    )
    tot = vals.agg(F.sum("cnt").cast("bigint").alias("n"))
    grid = spark.range(1, EQD_BINS + 1).select(F.col("id").alias("i"))
    target = (F.col("i") * F.col("n") + (EQD_BINS - 1)) .cast("bigint")
    # integer ceil-div: (i*n + bins-1) div bins
    tgt = F.floor(target / EQD_BINS)
    hit = F.col("run_cnt") >= tgt
    edges = (
        run.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(grid))
        .groupBy("i")
        .agg(
            F.min(F.when(hit, F.col("v"))).alias("upper_edge"),
            F.min(F.when(hit, F.col("run_cnt"))).cast("bigint").alias("cum_rows"),
        )
    )
    w = Window.orderBy("i")
    return edges.select(
        F.col("i").cast("bigint").alias("bin"),
        "upper_edge",
        "cum_rows",
        (F.col("cum_rows") - F.coalesce(F.lag("cum_rows").over(w), F.lit(0)))
        .cast("bigint")
        .alias("bin_rows"),
    )
