"""Funnel analysis (event-sequence analytics): per-user signup →
purchase conversion with time-to-convert — the pattern behind
MATCH_RECOGNIZE-style queries, expressed with conditional aggregates
(one shuffle on the user key, no self-join explosion).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_builder_spark.registry import register
from etl_builder_spark.session import load_table


@register(
    "funnel_signup_purchase",
    oracle="""
        WITH per_user AS (
            SELECT user_id,
                   MIN(ts) FILTER (WHERE event_type = 'signup') AS first_signup,
                   COUNT(*) FILTER (WHERE event_type = 'signup') AS n_signups,
                   COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchases
            FROM events
            GROUP BY user_id
        ),
        conv AS (
            SELECT p.user_id, p.first_signup, p.n_signups, p.n_purchases,
                   MIN(e.ts) AS first_purchase_after
            FROM per_user p
            LEFT JOIN events e
              ON e.user_id = p.user_id
             AND e.event_type = 'purchase'
             AND e.ts >= p.first_signup
            GROUP BY p.user_id, p.first_signup, p.n_signups, p.n_purchases
        )
        SELECT user_id, first_signup, n_signups, n_purchases,
               first_purchase_after,
               (first_purchase_after IS NOT NULL) AS converted,
               epoch_us(first_purchase_after) - epoch_us(first_signup) AS convert_us
        FROM conv
    """,
    tags=("AN-funnel",),
)
def funnel_signup_purchase(spark, sf_dir):
    """Per-user funnel: first signup, first purchase at-or-after it,
    conversion flag, exact µs time-to-convert. NULL-generating by
    design (users who never sign up / never convert)."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("first_signup"),
        F.count(F.when(F.col("event_type") == "signup", F.lit(1))).alias("n_signups"),
        F.count(F.when(F.col("event_type") == "purchase", F.lit(1))).alias("n_purchases"),
    )
    p = per_user.alias("p")
    ev = e.where(F.col("event_type") == "purchase").alias("e")
    conv = (
        p.join(
            ev,
            (F.col("e.user_id") == F.col("p.user_id"))
            & (F.col("e.ts") >= F.col("p.first_signup")),
            "left",
        )
        .groupBy("p.user_id", "p.first_signup", "p.n_signups", "p.n_purchases")
        .agg(F.min("e.ts").alias("first_purchase_after"))
    )
    return conv.select(
        F.col("user_id"),
        F.col("first_signup"),
        F.col("n_signups"),
        F.col("n_purchases"),
        F.col("first_purchase_after"),
        F.col("first_purchase_after").isNotNull().alias("converted"),
        (
            F.unix_micros(F.col("first_purchase_after")) - F.unix_micros(F.col("first_signup"))
        ).alias("convert_us"),
    )


@register(
    "cohort_weekly_retention",
    oracle="""
        WITH firsts AS (
            SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
            FROM events GROUP BY user_id
        ),
        activity AS (
            SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
            FROM events
        ),
        cohort_sizes AS (
            SELECT cohort_week, COUNT(*) AS n_cohort FROM firsts GROUP BY 1
        ),
        cells AS (
            SELECT f.cohort_week,
                   CAST(datediff('week', f.cohort_week, a.active_week) AS BIGINT)
                       AS week_offset,
                   COUNT(DISTINCT a.user_id) AS n_active
            FROM firsts f JOIN activity a ON a.user_id = f.user_id
            GROUP BY 1, 2
        )
        SELECT c.cohort_week, c.week_offset, c.n_active, s.n_cohort,
               ROUND(CAST(c.n_active AS DOUBLE) / s.n_cohort, 6) AS retention
        FROM cells c JOIN cohort_sizes s ON s.cohort_week = c.cohort_week
    """,
    tags=("funnel-cohort",),
)
def cohort_weekly_retention(spark, sf_dir):
    """Weekly cohort retention — the product-analytics staple: users
    grouped by their first-activity week, each later week's activity
    expressed as a fraction of the cohort.  Three aggregates and one
    broadcast-sized join: per-user firsts (one shuffle on user_id),
    distinct user-weeks (same key — Catalyst reuses the partitioning),
    and the (cohort × offset) cells, which are tiny at any corpus
    size.  100 TB posture: everything keys on user_id until the final
    cells aggregate; the output matrix is O(weeks²) regardless of
    event volume."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_week")
    ).distinct()
    cohort_sizes = firsts.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("n_cohort"))
    cells = (
        firsts.join(activity, "user_id")
        .groupBy(
            "cohort_week",
            F.datediff(F.col("active_week"), F.col("cohort_week")).cast("bigint")
            .alias("days_off"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
        .select(
            "cohort_week",
            (F.col("days_off") / 7).cast("bigint").alias("week_offset"),
            "n_active",
        )
    )
    return cells.join(F.broadcast(cohort_sizes), "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_active",
        "n_cohort",
        F.round(F.col("n_active").cast("double") / F.col("n_cohort"), 6).alias("retention"),
    )
