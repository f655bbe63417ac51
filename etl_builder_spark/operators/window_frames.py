"""Explicit window frames: nth_value / last_value / first_value over
full-partition and trailing ROWS frames (completes the E-row frame
coverage beyond running/range frames).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_builder_spark.registry import register
from etl_builder_spark.session import load_table


@register(
    "win_frames_nth",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_extendedprice,
               nth_value(l_extendedprice, 2) OVER wfull AS second_highest,
               last_value(l_extendedprice)  OVER wfull AS lowest,
               first_value(l_linenumber)    OVER wfull AS top_linenumber,
               avg(l_extendedprice) OVER (PARTITION BY l_orderkey
                   ORDER BY l_extendedprice DESC, l_linenumber
                   ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS trailing2_avg
        FROM lineitem
        WHERE l_orderkey < 2000
        WINDOW wfull AS (PARTITION BY l_orderkey
                         ORDER BY l_extendedprice DESC, l_linenumber
                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("E-frames",),
)
def win_frames_nth(spark, sf_dir):
    """nth/last/first over the full-partition frame + a trailing-2
    ROWS average. trailing2_avg averages 1-2 exact 2-dp doubles —
    (a+b)/2 is the identical IEEE expression on both engines."""
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 2000)
    order = [F.col("l_extendedprice").desc(), F.col("l_linenumber")]
    wfull = (
        Window.partitionBy("l_orderkey")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    wtrail = Window.partitionBy("l_orderkey").orderBy(*order).rowsBetween(-1, 0)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        F.nth_value("l_extendedprice", 2).over(wfull).alias("second_highest"),
        F.last("l_extendedprice").over(wfull).alias("lowest"),
        F.first("l_linenumber").over(wfull).alias("top_linenumber"),
        F.avg("l_extendedprice").over(wtrail).alias("trailing2_avg"),
    )


@register(
    "win_sliding_median_rows",
    oracle="""
        SELECT event_id, user_id, value,
               lst[(len(lst) + 1) // 2] AS median_5
        FROM (
            SELECT event_id, user_id, value,
                   list_sort(list(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)) AS lst
            FROM events WHERE event_type = 'purchase'
              -- complete-case (r12): NULL values are not observations —
              -- collect_list/list() otherwise disagree on keeping them
              AND value IS NOT NULL
        )
    """,
    tags=("E-frames",),
)
def win_sliding_median_rows(spark, sf_dir):
    """Sliding-window median (lower median of the trailing 5 purchase
    values per user) — the order-statistic frame aggregate Spark has
    no native window function for, composed as collect_list over a
    ROWS frame → sort_array → element_at.  The frame holds ≤5 exact
    2-dp doubles, so the sorted pick is value-exact with no rounding;
    ordering ties break on event_id (total order).  Partitioned by
    user_id — bounded frames, never an unpartitioned Window; the
    per-row list is O(frame), not O(partition)."""
    e = load_table(spark, sf_dir, "events").where(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    lst = F.sort_array(F.collect_list(F.col("value")).over(w))
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.element_at(lst, ((F.size(lst) + 1) / 2).cast("int")).alias("median_5"),
    )
