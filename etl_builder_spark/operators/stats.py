"""Distributed statistics: Poisson-bootstrap confidence intervals —
the MapReduce-era answer to "resample a dataset you cannot hold
anywhere": classic bootstrap resampling draws n rows WITH replacement
(a global operation), but for large n the per-row multiplicity in a
resample is Poisson(1) to vanishing error, and Poisson draws are
independent PER ROW — so every row computes its own weight for every
replicate locally, and B resampled aggregates become one weighted
aggregation over an ×B expansion.  No sampling pass, no global state,
no driver.

Determinism contract (policy §7.2): the Poisson draw is an inverse-
CDF lookup on a hash uniform (first 32 bits of md5(key:replicate) —
byte-identical across engines, cf. ml_feature_hashing) against
PRECOMPUTED CDF literals (no cross-engine exp()); replicate means are
exact DECIMAL sums divided by exact counts; the across-replicate
variance uses the round-then-DECIMAL trick (6-dp replicate means
summed exactly), so the only floats are identical IEEE division/sqrt.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_builder_spark.policy import money
from etl_builder_spark.registry import register
from etl_builder_spark.session import load_table

#: number of bootstrap replicates
BOOT_B = 20

#: Poisson(1) CDF, precomputed Python floats injected as literals into
#: both engines; multiplicity capped at 7 (P ≈ 1e-4 tail).
POISSON1_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238463,
    0.9963401531726563,
    0.9994058151824183,
    0.999916758850712,
)

_K_CASE_SQL = (
    "CASE "
    + " ".join(f"WHEN u < {p!r} THEN {k}" for k, p in enumerate(POISSON1_CDF))
    + " ELSE 7 END"
)


@register(
    "stats_poisson_bootstrap_ci",
    oracle=f"""
        WITH expanded AS (
            SELECT o_totalprice, b,
                   list_reduce(list_transform(
                       list_filter(string_split_regex(
                           substr(md5(CAST(o_orderkey AS VARCHAR) || ':' || CAST(b AS VARCHAR)), 1, 8),
                           ''), c -> c <> ''),
                       c -> CAST(instr('0123456789abcdef', c) - 1 AS BIGINT)),
                       (a, x) -> a * 16 + x) / 4294967296.0 AS u
            FROM orders CROSS JOIN unnest(range(0, {BOOT_B})) AS t(b)
        ),
        weighted AS (SELECT b, o_totalprice, {_K_CASE_SQL} AS k FROM expanded),
        reps AS (
            SELECT b,
                   CAST(ROUND(CAST(SUM(k * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                              / SUM(k), 6) AS DECIMAL(28,6)) AS m
            FROM weighted GROUP BY b
        ),
        ints AS (SELECT CAST(m * 1000000 AS BIGINT) AS mi FROM reps),
        boot AS (
            SELECT COUNT(*) AS nb,
                   CAST(SUM(mi) AS DOUBLE) / 1000000.0 AS sm,
                   CAST(SUM(CAST(mi AS HUGEINT) * mi) AS DOUBLE) / 1000000000000.0 AS sm2
            FROM ints
        ),
        point AS (
            SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
                       AS est
            FROM orders
        )
        SELECT CAST(nb AS BIGINT) AS n_replicates,
               ROUND(est, 6) AS point_estimate,
               ROUND(sm / nb, 6) AS boot_mean,
               ROUND(sqrt((sm2 - sm * sm / nb) / (nb - 1)), 6) AS boot_se,
               ROUND(est - 1.96 * sqrt((sm2 - sm * sm / nb) / (nb - 1)), 6) AS ci_lo,
               ROUND(est + 1.96 * sqrt((sm2 - sm * sm / nb) / (nb - 1)), 6) AS ci_hi
        FROM boot CROSS JOIN point
    """,
    tags=("STATS-bootstrap",),
)
def stats_poisson_bootstrap_ci(spark, sf_dir):
    """95% bootstrap CI for the mean order total via {BOOT_B} Poisson
    replicates (see module docstring).  The ×B expansion is an
    expression-side explode; each replicate mean is one weighted
    aggregation with map-side combine; the across-replicate moments
    reduce {BOOT_B} rows.

    100 TB posture: this is the ONLY bootstrap that scales — per-row
    hash weights mean zero coordination, the shuffle carries B partial
    aggregates per mapper (not B resamples of the data), and adding
    replicates scales compute linearly while the data is still read
    ONCE.  The same shape yields CIs for any algebraic aggregate
    (sums, ratios, regression moments)."""
    o = load_table(spark, sf_dir, "orders")
    b = F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))).alias("b")
    expanded = o.select(money("o_totalprice").alias("p"), F.col("o_orderkey"), b)
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("o_orderkey").cast("string"), F.lit(":"), F.col("b").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    )
    k = None
    for i, p in enumerate(POISSON1_CDF):
        k = F.when(u < p, i) if k is None else k.when(u < p, i)
    k = k.otherwise(7)
    reps = (
        expanded.select("b", "p", k.alias("k"))
        .groupBy("b")
        .agg(
            F.round((F.sum(F.col("k") * F.col("p")).cast("double") / F.sum("k")), 6)
            .cast("decimal(28,6)")
            .alias("m")
        )
    )
    # across-replicate moments in scaled integers (m is an exact 6-dp
    # decimal): squares in DECIMAL(38,0) — a decimal×decimal square
    # would hit the two engines' DIFFERENT precision-overflow rules
    ints = reps.select((F.col("m") * 1000000).cast("long").alias("mi"))
    boot = ints.agg(
        F.count(F.lit(1)).alias("nb"),
        (F.sum("mi").cast("double") / F.lit(1000000.0)).alias("sm"),
        (
            F.sum(F.col("mi").cast("decimal(38,0)") * F.col("mi")).cast("double")
            / F.lit(1000000000000.0)
        ).alias("sm2"),
    )
    point = o.agg(
        (F.sum(money("o_totalprice")).cast("double") / F.count(F.lit(1))).alias("est")
    )
    se = F.sqrt((F.col("sm2") - F.col("sm") * F.col("sm") / F.col("nb")) / (F.col("nb") - 1))
    return boot.crossJoin(F.broadcast(point)).select(
        F.col("nb").cast("bigint").alias("n_replicates"),
        F.round(F.col("est"), 6).alias("point_estimate"),
        F.round(F.col("sm") / F.col("nb"), 6).alias("boot_mean"),
        F.round(se, 6).alias("boot_se"),
        F.round(F.col("est") - 1.96 * se, 6).alias("ci_lo"),
        F.round(F.col("est") + 1.96 * se, 6).alias("ci_hi"),
    )
