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
            SELECT least(CAST(floor((o_totalprice - 0) / 50000) AS BIGINT), 9) AS bin
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
    expression on both engines — no width_bucket dialect risk."""
    o = load_table(spark, sf_dir, "orders")
    bin_ = F.least(F.floor((F.col("o_totalprice") - 0) / 50000), F.lit(9)).cast("long")
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
