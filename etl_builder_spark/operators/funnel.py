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
