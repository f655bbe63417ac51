"""Hypothesis-testing statistics: Welch's t, a pinned permutation
test, and grid-search quantile regression (SURVEY §2 STATS family,
round-9 wave).

Determinism (policy §7.2): every cross-row accumulation is exact —
BIGINT counts/cent-sums or the stats_anova_oneway DECIMAL(18,2)
square idiom — and each statistic is one fixed final float
expression written identically in both engines, ROUND(·,6)-ed once.

Scale posture: all three are single conditional aggregates (the
ml_decision_stump_scan shape): the permutation B-grid and the slope
grid multiply rows only inside map-side combine, so the data passes
once and the shuffle carries |grid| accumulator groups regardless of
row count.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from etl_builder_spark.folding import nan_to_null

from etl_builder_spark.registry import register
from etl_builder_spark.session import load_table

#: the two priority arms compared by Welch's t — extreme ends of the
#: fixed TPC-H priority domain.
WELCH_A = "1-URGENT"
WELCH_B = "5-LOW"


@register(
    "stats_welch_ttest",
    oracle=f"""
        WITH m AS (
            SELECT
                CAST(SUM(CASE WHEN o_orderpriority = '{WELCH_A}' THEN 1 ELSE 0 END)
                     AS BIGINT) AS n1,
                CAST(SUM(CASE WHEN o_orderpriority = '{WELCH_A}'
                              THEN CAST(o_totalprice AS DECIMAL(18,2))
                              ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS s1,
                CAST(SUM(CASE WHEN o_orderpriority = '{WELCH_A}'
                              THEN CAST(o_totalprice AS DECIMAL(18,2))
                                   * CAST(o_totalprice AS DECIMAL(18,2))
                              ELSE CAST(0 AS DECIMAL(38,4)) END) AS DOUBLE) AS q1,
                CAST(SUM(CASE WHEN o_orderpriority = '{WELCH_B}' THEN 1 ELSE 0 END)
                     AS BIGINT) AS n2,
                CAST(SUM(CASE WHEN o_orderpriority = '{WELCH_B}'
                              THEN CAST(o_totalprice AS DECIMAL(18,2))
                              ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS s2,
                CAST(SUM(CASE WHEN o_orderpriority = '{WELCH_B}'
                              THEN CAST(o_totalprice AS DECIMAL(18,2))
                                   * CAST(o_totalprice AS DECIMAL(18,2))
                              ELSE CAST(0 AS DECIMAL(38,4)) END) AS DOUBLE) AS q2
            FROM orders
        )
        SELECT n1 AS n_urgent, n2 AS n_low,
               ROUND(s1 / n1, 6) AS mean_urgent,
               ROUND(s2 / n2, 6) AS mean_low,
               ROUND((s1 / n1 - s2 / n2)
                     / sqrt((q1 - s1 * s1 / n1) / (n1 - 1) / n1
                            + (q2 - s2 * s2 / n2) / (n2 - 1) / n2), 6)
                   AS t_stat,
               ROUND(((q1 - s1 * s1 / n1) / (n1 - 1) / n1
                      + (q2 - s2 * s2 / n2) / (n2 - 1) / n2)
                     * ((q1 - s1 * s1 / n1) / (n1 - 1) / n1
                        + (q2 - s2 * s2 / n2) / (n2 - 1) / n2)
                     / (((q1 - s1 * s1 / n1) / (n1 - 1) / n1)
                        * ((q1 - s1 * s1 / n1) / (n1 - 1) / n1) / (n1 - 1)
                        + ((q2 - s2 * s2 / n2) / (n2 - 1) / n2)
                          * ((q2 - s2 * s2 / n2) / (n2 - 1) / n2) / (n2 - 1)), 6)
                   AS welch_df,
               ROUND((s1 / n1 - s2 / n2)
                     / sqrt(((q1 - s1 * s1 / n1) + (q2 - s2 * s2 / n2))
                            / (n1 + n2 - 2)), 6)
                   AS cohen_d
        FROM m
    """,
    tags=("STATS-tests",),
)
def stats_welch_ttest(spark, sf_dir):
    """Welch's unequal-variance t-test between the 1-URGENT and 5-LOW
    order arms on o_totalprice, plus the Welch–Satterthwaite degrees
    of freedom and Cohen's d — the A/B gatekeeper statistic computed
    as ONE conditional aggregate (six accumulators), the
    stats_anova_oneway discipline: sums and sums-of-squares
    accumulate as exact DECIMAL (order-free), and every statistic is
    one fixed float expression of the six exact numbers, identical in
    both engines, rounded once at 6 dp.

    100 TB posture: one map-side-combined pass over orders; the
    statistic reduction is a 1-row expression.  The sum-of-squares
    decimal→double conversion is exact through sf0.1 magnitudes
    (~3.8e16 < 2^53-ish significance); past ~1e18 the policy.py
    ratio-space caveat applies (same envelope as stats_anova_oneway)."""
    o = load_table(spark, sf_dir, "orders")
    y = F.col("o_totalprice").cast("decimal(18,2)")
    zero2 = F.lit(0).cast("decimal(18,2)")
    zero4 = F.lit(0).cast("decimal(38,4)")
    in_a = F.col("o_orderpriority") == WELCH_A
    in_b = F.col("o_orderpriority") == WELCH_B
    m = o.agg(
        F.sum(F.when(in_a, 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(in_a, y).otherwise(zero2)).cast("double").alias("s1"),
        F.sum(F.when(in_a, y * y).otherwise(zero4)).cast("double").alias("q1"),
        F.sum(F.when(in_b, 1).otherwise(0)).cast("bigint").alias("n2"),
        F.sum(F.when(in_b, y).otherwise(zero2)).cast("double").alias("s2"),
        F.sum(F.when(in_b, y * y).otherwise(zero4)).cast("double").alias("q2"),
    )
    # try_divide throughout (round-12 degenerate sweep): an absent or
    # singleton arm zeroes n, n-1, or a variance — DuckDB's x/0 is
    # NULL and NULL-propagates through the closed forms, so the
    # guarded divisions keep both engines on the same defined NULLs
    n1, s1, q1 = F.col("n1"), F.col("s1"), F.col("q1")
    n2, s2, q2 = F.col("n2"), F.col("s2"), F.col("q2")
    mean1 = F.try_divide(s1, n1)
    mean2 = F.try_divide(s2, n2)
    se1 = F.try_divide(F.try_divide(q1 - F.try_divide(s1 * s1, n1), n1 - 1), n1)
    se2 = F.try_divide(F.try_divide(q2 - F.try_divide(s2 * s2, n2), n2 - 1), n2)
    return m.select(
        n1.alias("n_urgent"),
        n2.alias("n_low"),
        F.round(mean1, 6).alias("mean_urgent"),
        F.round(mean2, 6).alias("mean_low"),
        F.round(F.try_divide(mean1 - mean2, F.sqrt(se1 + se2)), 6).alias("t_stat"),
        F.round(
            F.try_divide(
                (se1 + se2) * (se1 + se2),
                F.try_divide(se1 * se1, n1 - 1) + F.try_divide(se2 * se2, n2 - 1),
            ),
            6,
        ).alias("welch_df"),
        F.round(
            F.try_divide(
                mean1 - mean2,
                F.sqrt(
                    F.try_divide(
                        (q1 - F.try_divide(s1 * s1, n1))
                        + (q2 - F.try_divide(s2 * s2, n2)),
                        n1 + n2 - 2,
                    )
                ),
            ),
            6,
        ).alias("cohen_d"),
    )


#: permutation count; b=0 is the OBSERVED labeling (purchase vs rest),
#: b=1..PERM_B are pinned pseudo-random relabelings.
PERM_B = 32
#: per-permutation salt stride (odd, > 2^20) and the Knuth mixer —
#: shared with sample_hash_deterministic; the % 10000 bucket (not the
#: low bit, which for an odd multiplier is just parity of the input)
#: decides the pseudo-arm.
PERM_SALT = 1000003
KNUTH = 2654435761


@register(
    "stats_permutation_test_pinned",
    oracle=f"""
        WITH grid AS (SELECT b FROM generate_series(0, {PERM_B}) t(b)),
        arms AS (
            SELECT b,
                   CAST(SUM(CASE WHEN grp THEN 1 ELSE 0 END) AS BIGINT) AS na,
                   CAST(SUM(CASE WHEN grp THEN xc ELSE 0 END) AS BIGINT) AS sa,
                   CAST(SUM(CASE WHEN grp THEN 0 ELSE 1 END) AS BIGINT) AS nb,
                   CAST(SUM(CASE WHEN grp THEN 0 ELSE xc END) AS BIGINT) AS sb
            FROM (
                SELECT b,
                       CASE WHEN b = 0 THEN event_type = 'purchase'
                            ELSE ((event_id + b * {PERM_SALT}) * {KNUTH})
                                 % 4294967296 % 10000 < 5000
                       END AS grp,
                       CAST(ROUND(value * 100) AS BIGINT) AS xc
                FROM events CROSS JOIN grid
            )
            GROUP BY b
        ),
        diffs AS (
            SELECT b,
                   CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb AS diff
            FROM arms
        )
        SELECT ROUND((SELECT diff FROM diffs WHERE b = 0) / 100, 6)
                   AS observed_diff,
               CAST({PERM_B} AS BIGINT) AS n_perms,
               CAST((SELECT COUNT(*) FROM diffs
                     WHERE b > 0 AND ABS(diff) >=
                           ABS((SELECT diff FROM diffs WHERE b = 0))) AS BIGINT)
                   AS n_ge,
               ROUND((1.0 + (SELECT COUNT(*) FROM diffs
                             WHERE b > 0 AND ABS(diff) >=
                                   ABS((SELECT diff FROM diffs WHERE b = 0))))
                     / (1 + {PERM_B}), 6) AS p_value
    """,
    tags=("STATS-tests",),
)
def stats_permutation_test_pinned(spark, sf_dir):
    """Permutation test for the purchase-vs-rest mean event value,
    with a PINNED null distribution: b = 0 carries the observed
    labeling, b = 1..{PERM_B} relabel every event by the Knuth mixer
    of (event_id + b·salt) — deterministic, engine-portable
    pseudo-permutations (random relabeling approximates exchangeable
    permutation for a two-arm mean difference).  The p-value is the
    add-one-smoothed rank of |observed| in the null |diffs|.

    100 TB posture: the decision-stump-scan shape — the ×(B+1) grid
    expansion collapses inside map-side combine, so events passes
    ONCE and the shuffle carries B+1 groups of four exact BIGINT
    accumulators (value in integer cents); the rank step runs on the
    33-row result.  More permutations = wider grid, same single
    pass — the cluster cost of B=1000 is the same scan."""
    e = load_table(spark, sf_dir, "events")
    grid = spark.range(0, PERM_B + 1).select(F.col("id").alias("b"))
    xc = nan_to_null(F.round(F.col("value") * 100)).cast("bigint")
    grp = F.when(F.col("b") == 0, F.col("event_type") == "purchase").otherwise(
        F.pmod(
            F.pmod((F.col("event_id") + F.col("b") * PERM_SALT) * KNUTH, F.lit(4294967296)),
            F.lit(10000),
        )
        < 5000
    )
    arms = (
        e.crossJoin(F.broadcast(grid))
        .select("b", grp.alias("grp"), xc.alias("xc"))
        .groupBy("b")
        .agg(
            F.sum(F.when(F.col("grp"), 1).otherwise(0)).cast("bigint").alias("na"),
            F.sum(F.when(F.col("grp"), F.col("xc")).otherwise(0)).cast("bigint").alias("sa"),
            F.sum(F.when(F.col("grp"), 0).otherwise(1)).cast("bigint").alias("nb"),
            F.sum(F.when(F.col("grp"), 0).otherwise(F.col("xc"))).cast("bigint").alias("sb"),
        )
    )
    # NULLIF-guarded arm means and a literal one-row anchor (round-12
    # degenerate sweep): an empty or one-arm corpus makes na/nb zero —
    # DuckDB's double/0 is NULL, so the guard aligns Spark — and the
    # summary row must exist (all-NULL observed, n_ge = 0) even when
    # the diffs frame is empty, exactly like the oracle's FROM-less
    # outer SELECT.
    diffs = arms.select(
        "b",
        (
            F.col("sa").cast("double") / F.nullif(F.col("na"), F.lit(0))
            - F.col("sb").cast("double") / F.nullif(F.col("nb"), F.lit(0))
        ).alias("diff"),
    ).persist()  # 33 rows; obs + null-rank branches must not rescan events
    obs = diffs.where(F.col("b") == 0).select(F.col("diff").alias("obs_diff"))
    null = (
        diffs.where(F.col("b") > 0)
        .crossJoin(F.broadcast(obs))
        .agg(
            F.sum(
                F.when(F.abs(F.col("diff")) >= F.abs(F.col("obs_diff")), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_ge")
        )
    )
    one = spark.range(1).select(F.lit(1).alias("__one"))
    return (
        one.join(F.broadcast(obs.crossJoin(F.broadcast(null))), F.lit(True), "left")
        .select(
            F.round(F.col("obs_diff") / 100, 6).alias("observed_diff"),
            F.lit(PERM_B).cast("bigint").alias("n_perms"),
            F.coalesce(F.col("n_ge"), F.lit(0)).cast("bigint").alias("n_ge"),
            F.round(
                (1.0 + F.coalesce(F.col("n_ge"), F.lit(0))) / (1 + PERM_B), 6
            ).alias("p_value"),
        )
    )


#: candidate slopes (cents of extendedprice per unit quantity) for the
#: tau-quantile regression through the origin; the data's unit price
#: runs ~2k..105k dollars with p90 near 10k, so the grid brackets the
#: 0.9-quantile fit.
QR_SLOPES_CENTS = tuple(range(200_000, 1_100_000, 100_000))
QR_TAU_X10 = 9  # tau = 0.9, kept ×10 so the pinball loss stays integer


@register(
    "ml_quantile_regression_grid",
    oracle=f"""
        WITH grid AS (SELECT unnest([{", ".join(str(s) for s in QR_SLOPES_CENTS)}]) AS s),
        loss AS (
            SELECT s,
                   CAST(SUM(CASE WHEN u >= 0 THEN {QR_TAU_X10} * u
                                 ELSE ({QR_TAU_X10} - 10) * u END) AS BIGINT)
                       AS loss_x10,
                   CAST(SUM(CASE WHEN u >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_under
            FROM (
                SELECT s,
                       CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                       - s * CAST(l_quantity AS BIGINT) AS u
                FROM lineitem CROSS JOIN grid
            )
            GROUP BY s
        )
        SELECT CAST(s AS BIGINT) AS slope_cents,
               loss_x10,
               ROUND(CAST(loss_x10 AS DOUBLE) / 1000, 2) AS pinball_loss,
               n_under,
               (loss_x10 = (SELECT MIN(loss_x10) FROM loss)) AS is_best
        FROM loss
    """,
    tags=("ML-quantile",),
)
def ml_quantile_regression_grid(spark, sf_dir):
    """Quantile (tau = 0.9) regression of extendedprice on quantity
    through the origin, fit by GRID SEARCH over candidate slopes with
    the pinball loss — how quantile models (P90 latency curves, cost
    envelopes, demand upper bounds) are actually fit at scale when
    the model is low-dimensional: score every candidate in one pass,
    keep the argmin.  The loss is kept ×10 in exact BIGINT cents
    (tau·u⁺ + (tau−1)·u⁻ with tau = 9/10), so engines agree bit-for-
    bit; /1000 converts to dollars once at the end.

    100 TB posture: the decision-stump-scan shape again — the ×|grid|
    expansion collapses inside map-side combine (shuffle = |grid|
    groups of two BIGINT accumulators), lineitem passes once, and the
    argmin broadcast-joins a 9-row aggregate.  |u|·tau×10 ≤ ~5e9 per
    row keeps the sf0.1 sum ≤ ~3e15; past ~1e18 rows·cents the
    DECIMAL(38,0) swap applies (stats_kendall_tau_binned caveat)."""
    l = load_table(spark, sf_dir, "lineitem").select("l_quantity", "l_extendedprice")
    grid = spark.createDataFrame([(s,) for s in QR_SLOPES_CENTS], "s long")
    u = (
        nan_to_null(F.round(F.col("l_extendedprice") * 100)).cast("bigint")
        - F.col("s") * nan_to_null("l_quantity").cast("bigint")
    )
    loss = (
        l.crossJoin(F.broadcast(grid))
        .select("s", u.alias("u"))
        .groupBy("s")
        .agg(
            F.sum(
                F.when(F.col("u") >= 0, QR_TAU_X10 * F.col("u")).otherwise(
                    (QR_TAU_X10 - 10) * F.col("u")
                )
            )
            .cast("bigint")
            .alias("loss_x10"),
            F.sum(F.when(F.col("u") >= 0, 1).otherwise(0)).cast("bigint").alias("n_under"),
        )
    )
    # argmin via a whole-frame window on the |grid|-row aggregate (a
    # bounded slice — NOT a second scan of lineitem, which an agg-branch
    # reuse would recompute at 100 TB)
    from pyspark.sql import Window

    min_loss = F.min("loss_x10").over(Window.partitionBy())
    return loss.select(
        F.col("s").cast("bigint").alias("slope_cents"),
        "loss_x10",
        F.round(F.col("loss_x10").cast("double") / 1000, 2).alias("pinball_loss"),
        "n_under",
        (F.col("loss_x10") == min_loss).alias("is_best"),
    )


@register(
    "stats_mutual_information_binned",
    oracle="""
        WITH cells AS (
            SELECT CAST(l_quantity AS BIGINT) AS qx,
                   CAST(FLOOR(l_extendedprice / 5000) AS BIGINT) AS yb,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM lineitem GROUP BY 1, 2
        ),
        mx AS (SELECT qx, CAST(SUM(n) AS BIGINT) AS nx FROM cells GROUP BY qx),
        my AS (SELECT yb, CAST(SUM(n) AS BIGINT) AS ny FROM cells GROUP BY yb),
        tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM cells),
        terms AS (
            SELECT CAST(ROUND(CAST(c.n AS DOUBLE) / t.nn
                              * ln(CAST(c.n AS DOUBLE) * t.nn
                                   / (CAST(x.nx AS DOUBLE) * y.ny)), 9)
                        AS DECIMAL(28,9)) AS mi_term,
                   c.qx, c.yb, c.n
            FROM cells c
            JOIN mx x ON c.qx = x.qx
            JOIN my y ON c.yb = y.yb
            CROSS JOIN tot t
        ),
        hx AS (
            SELECT CAST(SUM(CAST(ROUND(-(CAST(nx AS DOUBLE) / t.nn)
                                       * ln(CAST(nx AS DOUBLE) / t.nn), 9)
                               AS DECIMAL(28,9))) AS DOUBLE) AS h
            FROM mx CROSS JOIN tot t
        ),
        hy AS (
            SELECT CAST(SUM(CAST(ROUND(-(CAST(ny AS DOUBLE) / t.nn)
                                       * ln(CAST(ny AS DOUBLE) / t.nn), 9)
                               AS DECIMAL(28,9))) AS DOUBLE) AS h
            FROM my CROSS JOIN tot t
        )
        SELECT (SELECT nn FROM tot) AS n_rows,
               CAST((SELECT COUNT(*) FROM cells) AS BIGINT) AS n_cells,
               ROUND(CAST(SUM(mi_term) AS DOUBLE), 6) AS mutual_information,
               ROUND((SELECT h FROM hx), 6) AS entropy_x,
               ROUND((SELECT h FROM hy), 6) AS entropy_y,
               ROUND(CAST(SUM(mi_term) AS DOUBLE)
                     / sqrt((SELECT h FROM hx) * (SELECT h FROM hy)), 6)
                   AS normalized_mi
        FROM terms
    """,
    tags=("STATS-info",),
)
def stats_mutual_information_binned(spark, sf_dir):
    """Mutual information between quantity and the 5000-wide price
    band, from the stats_kendall_tau_binned contingency grid: MI =
    Σ p_ij·ln(p_ij/(p_i·p_j)) plus both marginal entropies and the
    normalized MI/√(H_x·H_y) — the dependence screen feature stores
    run between candidate features and labels.  Float discipline
    (policy §7.2): every cell/marginal term is ROUND(·,9)-ed into
    DECIMAL(28,9) BEFORE summation, so the cross-row accumulation is
    exact and order-free in both engines, and only the final
    statistics divide/round.

    100 TB posture: one hash aggregate collapses the corpus to the
    bounded |quantity|×|band| grid; marginals and the term join are
    broadcast-size; the entropy/MI reductions run on at most a few
    thousand rows."""
    l = load_table(spark, sf_dir, "lineitem")
    cells = (
        l.select(
            nan_to_null("l_quantity").cast("bigint").alias("qx"),
            F.floor(nan_to_null("l_extendedprice") / 5000).cast("bigint").alias("yb"),
        )
        .groupBy("qx", "yb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .persist()  # feeds marginals, total, and the term join
    )
    mx = cells.groupBy("qx").agg(F.sum("n").cast("bigint").alias("nx"))
    my = cells.groupBy("yb").agg(F.sum("n").cast("bigint").alias("ny"))
    tot = cells.agg(F.sum("n").cast("bigint").alias("nn"))
    nn = F.col("nn")
    mi_term = F.round(
        F.col("n").cast("double")
        / nn
        * F.log(
            F.col("n").cast("double") * nn / (F.col("nx").cast("double") * F.col("ny"))
        ),
        9,
    ).cast("decimal(28,9)")
    terms = (
        cells.join(F.broadcast(mx), "qx")
        .join(F.broadcast(my), "yb")
        .crossJoin(F.broadcast(tot))
        .select(mi_term.alias("mi_term"))
    )
    hx = (
        mx.crossJoin(F.broadcast(tot))
        .select(
            F.round(
                -(F.col("nx").cast("double") / nn)
                * F.log(F.col("nx").cast("double") / nn),
                9,
            )
            .cast("decimal(28,9)")
            .alias("t")
        )
        .agg(F.sum("t").cast("double").alias("hx"))
    )
    hy = (
        my.crossJoin(F.broadcast(tot))
        .select(
            F.round(
                -(F.col("ny").cast("double") / nn)
                * F.log(F.col("ny").cast("double") / nn),
                9,
            )
            .cast("decimal(28,9)")
            .alias("t")
        )
        .agg(F.sum("t").cast("double").alias("hy"))
    )
    ncells = cells.agg(F.count(F.lit(1)).cast("bigint").alias("n_cells"))
    mi = terms.agg(F.sum("mi_term").cast("double").alias("mi"))
    return (
        tot.crossJoin(F.broadcast(ncells))
        .crossJoin(F.broadcast(mi))
        .crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .select(
            nn.alias("n_rows"),
            F.col("n_cells"),
            F.round(F.col("mi"), 6).alias("mutual_information"),
            F.round(F.col("hx"), 6).alias("entropy_x"),
            F.round(F.col("hy"), 6).alias("entropy_y"),
            # try_divide (round-12 degenerate sweep): a one-cell grid has
            # zero marginal entropy — normalized MI is the defined NULL
            F.round(
                F.try_divide(F.col("mi"), F.sqrt(F.col("hx") * F.col("hy"))), 6
            ).alias("normalized_mi"),
        )
    )


@register(
    "stats_cramers_v_corrected",
    oracle="""
        WITH cells AS (
            SELECT l_returnflag AS r, l_linestatus AS c,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM lineitem GROUP BY 1, 2
        ),
        rt AS (SELECT r, CAST(SUM(n) AS BIGINT) AS nr FROM cells GROUP BY r),
        ct AS (SELECT c, CAST(SUM(n) AS BIGINT) AS nc FROM cells GROUP BY c),
        tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM cells),
        terms AS (
            SELECT CAST(ROUND(
                       (cells.n - CAST(rt.nr AS DOUBLE) * ct.nc / tot.nt)
                       * (cells.n - CAST(rt.nr AS DOUBLE) * ct.nc / tot.nt)
                       / (CAST(rt.nr AS DOUBLE) * ct.nc / tot.nt), 9)
                       AS DECIMAL(28,9)) AS term
            FROM cells JOIN rt USING (r) JOIN ct USING (c) CROSS JOIN tot
        ),
        dims AS (
            SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM rt) AS nrow,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM ct) AS ncol,
                   (SELECT nt FROM tot) AS nt,
                   (SELECT CAST(SUM(term) AS DOUBLE) FROM terms) AS chi2
        )
        SELECT nt AS n_rows, nrow, ncol,
               ROUND(chi2, 6) AS chi2,
               ROUND(sqrt(chi2 / nt
                          / CASE WHEN nrow < ncol THEN nrow - 1
                                 ELSE ncol - 1 END), 6) AS cramers_v,
               ROUND(sqrt(
                   GREATEST(0.0, chi2 / nt
                            - CAST((nrow - 1) * (ncol - 1) AS DOUBLE)
                              / (nt - 1))
                   / CASE
                       WHEN nrow - CAST((nrow - 1) * (nrow - 1) AS DOUBLE)
                                   / (nt - 1)
                            < ncol - CAST((ncol - 1) * (ncol - 1) AS DOUBLE)
                                     / (nt - 1)
                       THEN nrow - CAST((nrow - 1) * (nrow - 1) AS DOUBLE)
                                   / (nt - 1) - 1
                       ELSE ncol - CAST((ncol - 1) * (ncol - 1) AS DOUBLE)
                                   / (nt - 1) - 1
                     END), 6) AS cramers_v_corrected
        FROM dims
    """,
    tags=("STATS-assoc",),
)
def stats_cramers_v_corrected(spark, sf_dir):
    """Cramér's V effect size for the (l_returnflag × l_linestatus)
    association, plus the Bergsma (2013) bias-corrected variant — the
    standardized 0..1 companion to stats_chi_square_independence (chi2
    alone grows with n; V is the comparable-across-tables number).

    Exactness follows the chi-square key verbatim: the contingency
    table, margins, and total are exact BIGINTs from ONE hash
    aggregation; each cell term is a fixed double expression rounded
    to 9 dp into DECIMAL(28,9) so the chi2 sum is order-free; V and
    the corrected V are single float expressions of (chi2, n, r, c)
    written identically in both engines, rounded once at 6 dp.

    100 TB posture: identical to stats_chi_square_independence — one
    map-side-combined aggregation to ≤ |R|·|C| cells, then arithmetic
    on a broadcast-sized frame.  TPC-H's return-flag/line-status pair
    has every cell populated, so the observed-cell join IS the full
    grid (zero-observed cells would need the cross-join grid of the
    margins — same tiny frame)."""
    li = load_table(spark, sf_dir, "lineitem")
    cells = (
        li.groupBy(F.col("l_returnflag").alias("r"), F.col("l_linestatus").alias("c"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .persist()
    )
    rt = cells.groupBy("r").agg(F.sum("n").cast("bigint").alias("nr"))
    ct = cells.groupBy("c").agg(F.sum("n").cast("bigint").alias("nc"))
    tot = cells.agg(F.sum("n").cast("bigint").alias("nt"))
    exp = F.col("nr").cast("double") * F.col("nc") / F.col("nt")
    terms = (
        cells.join(F.broadcast(rt), "r")
        .join(F.broadcast(ct), "c")
        .crossJoin(F.broadcast(tot))
        .select(
            F.round((F.col("n") - exp) * (F.col("n") - exp) / exp, 9)
            .cast("decimal(28,9)")
            .alias("term")
        )
        .agg(F.sum("term").cast("double").alias("chi2"))
    )
    dims = (
        rt.agg(F.count(F.lit(1)).cast("bigint").alias("nrow"))
        .crossJoin(F.broadcast(ct.agg(F.count(F.lit(1)).cast("bigint").alias("ncol"))))
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(terms))
    )
    nrow, ncol, nt, chi2 = (
        F.col("nrow"),
        F.col("ncol"),
        F.col("nt"),
        F.col("chi2"),
    )
    # try_divide (round-12 degenerate sweep): a 1×1 grid zeroes k−1 and
    # a single row zeroes n−1 — V is the defined NULL on both engines
    phi2 = chi2 / nt
    kmin1 = F.when(nrow < ncol, nrow - 1).otherwise(ncol - 1)
    phi2c = F.greatest(
        F.lit(0.0),
        phi2 - F.try_divide(((nrow - 1) * (ncol - 1)).cast("double"), nt - 1),
    )
    rc_ = nrow - F.try_divide(((nrow - 1) * (nrow - 1)).cast("double"), nt - 1)
    cc_ = ncol - F.try_divide(((ncol - 1) * (ncol - 1)).cast("double"), nt - 1)
    kminc = F.when(rc_ < cc_, rc_ - 1).otherwise(cc_ - 1)
    return dims.select(
        nt.alias("n_rows"),
        nrow,
        ncol,
        F.round(chi2, 6).alias("chi2"),
        F.round(F.sqrt(F.try_divide(phi2, kmin1)), 6).alias("cramers_v"),
        F.round(F.sqrt(F.try_divide(phi2c, kminc)), 6).alias("cramers_v_corrected"),
    )


@register(
    "stats_cohens_kappa",
    oracle="""
        WITH banded AS (
            SELECT
                CASE WHEN CAST(l_quantity AS BIGINT) <= 16 THEN 'low'
                     WHEN CAST(l_quantity AS BIGINT) <= 33 THEN 'mid'
                     ELSE 'high' END AS qb,
                CASE WHEN CAST(ROUND(l_discount * 100, 0) AS BIGINT) <= 3
                          THEN 'low'
                     WHEN CAST(ROUND(l_discount * 100, 0) AS BIGINT) <= 7
                          THEN 'mid'
                     ELSE 'high' END AS db
            FROM lineitem
        ),
        cells AS (
            SELECT qb, db, CAST(COUNT(*) AS BIGINT) AS n
            FROM banded GROUP BY 1, 2
        ),
        margins AS (
            SELECT b AS band,
                   CAST(SUM(CASE WHEN side = 'q' THEN n ELSE 0 END) AS BIGINT)
                       AS rq,
                   CAST(SUM(CASE WHEN side = 'd' THEN n ELSE 0 END) AS BIGINT)
                       AS rd
            FROM (
                SELECT 'q' AS side, qb AS b, n FROM cells
                UNION ALL
                SELECT 'd' AS side, db AS b, n FROM cells
            )
            GROUP BY b
        ),
        stats AS (
            SELECT
                (SELECT CAST(SUM(n) AS BIGINT) FROM cells) AS nt,
                (SELECT CAST(SUM(CASE WHEN qb = db THEN n ELSE 0 END)
                             AS BIGINT) FROM cells) AS diag,
                (SELECT CAST(SUM(rq * rd) AS BIGINT) FROM margins) AS chance
        )
        SELECT nt AS n_rows, diag AS n_agree,
               ROUND(CAST(diag AS DOUBLE) / nt, 6) AS p_observed,
               ROUND(CAST(chance AS DOUBLE) / nt / nt, 6) AS p_chance,
               ROUND((CAST(nt AS DOUBLE) * diag - chance)
                     / (CAST(nt AS DOUBLE) * nt - chance), 6) AS kappa
        FROM stats
    """,
    tags=("STATS-assoc",),
)
def stats_cohens_kappa(spark, sf_dir):
    """Cohen's kappa agreement between two banded classifications of
    each lineitem — quantity tercile (1–16 / 17–33 / 34–50) vs
    discount band (≤3% / 4–7% / ≥8%) — the chance-corrected agreement
    statistic used to audit whether two labeling pipelines agree
    beyond what their marginal label rates force.

    Exactness: the float l_discount is snapped to integer percent via
    ROUND(·*100) BEFORE banding (no float threshold compares); the 3×3
    contingency, both margins, the diagonal, and Σ rq·rd are exact
    BIGINTs, so kappa = (n·diag − Σrq·rd)/(n² − Σrq·rd) is ONE float
    division of exact integers, rounded once.  n² and n·diag stay
    under int64 through ~3e9 rows; past that the documented swap is
    DECIMAL(38,0) for the two products (stats_ratio_delta_ci
    precedent).

    100 TB posture: one map-side-combined aggregation to ≤9 cells;
    margins and the kappa arithmetic run on that broadcast-sized cell
    frame — no second scan, no window, no shuffle beyond the 9-group
    exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    q = nan_to_null("l_quantity").cast("bigint")
    d = nan_to_null(F.round(F.col("l_discount") * 100, 0)).cast("bigint")
    qb = F.when(q <= 16, "low").when(q <= 33, "mid").otherwise("high")
    db = F.when(d <= 3, "low").when(d <= 7, "mid").otherwise("high")
    cells = (
        li.select(qb.alias("qb"), db.alias("db"))
        .groupBy("qb", "db")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .persist()
    )
    margins = (
        cells.select(F.lit("q").alias("side"), F.col("qb").alias("b"), "n")
        .unionAll(cells.select(F.lit("d").alias("side"), F.col("db").alias("b"), "n"))
        .groupBy("b")
        .agg(
            F.sum(F.when(F.col("side") == "q", F.col("n")).otherwise(0))
            .cast("bigint")
            .alias("rq"),
            F.sum(F.when(F.col("side") == "d", F.col("n")).otherwise(0))
            .cast("bigint")
            .alias("rd"),
        )
    )
    tot = cells.agg(
        F.sum("n").cast("bigint").alias("nt"),
        F.sum(F.when(F.col("qb") == F.col("db"), F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("diag"),
    )
    chance = margins.agg(F.sum(F.col("rq") * F.col("rd")).cast("bigint").alias("chance"))
    nt, diag, ch = F.col("nt"), F.col("diag"), F.col("chance")
    return (
        tot.crossJoin(F.broadcast(chance))
        .select(
            nt.alias("n_rows"),
            diag.alias("n_agree"),
            # try_divide (round-12 degenerate sweep): perfect chance
            # agreement (n² = Σrq·rd, e.g. a single row) makes kappa
            # the defined NULL on both engines
            F.round(F.try_divide(diag.cast("double"), nt), 6).alias("p_observed"),
            F.round(F.try_divide(F.try_divide(ch.cast("double"), nt), nt), 6).alias(
                "p_chance"
            ),
            F.round(
                F.try_divide(
                    nt.cast("double") * diag - ch, nt.cast("double") * nt - ch
                ),
                6,
            ).alias("kappa"),
        )
    )


@register(
    "ml_mcc_binary_gate",
    oracle="""
        WITH conf AS (
            SELECT
                CAST(SUM(CASE WHEN l_returnflag = 'R'
                              AND CAST(ROUND(l_discount * 100, 0) AS BIGINT) >= 6
                              THEN 1 ELSE 0 END) AS BIGINT) AS tp,
                CAST(SUM(CASE WHEN l_returnflag <> 'R'
                              AND CAST(ROUND(l_discount * 100, 0) AS BIGINT) >= 6
                              THEN 1 ELSE 0 END) AS BIGINT) AS fp,
                CAST(SUM(CASE WHEN l_returnflag = 'R'
                              AND CAST(ROUND(l_discount * 100, 0) AS BIGINT) < 6
                              THEN 1 ELSE 0 END) AS BIGINT) AS fn,
                CAST(SUM(CASE WHEN l_returnflag <> 'R'
                              AND CAST(ROUND(l_discount * 100, 0) AS BIGINT) < 6
                              THEN 1 ELSE 0 END) AS BIGINT) AS tn
            FROM lineitem
        )
        SELECT tp, fp, fn, tn,
               ROUND(CAST(tp AS DOUBLE) / (tp + fp), 6) AS precision_,
               ROUND(CAST(tp AS DOUBLE) / (tp + fn), 6) AS recall_,
               ROUND(2.0 * tp / (2.0 * tp + fp + fn), 6) AS f1,
               ROUND((CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn)
                     / (sqrt(CAST(tp + fp AS DOUBLE))
                        * sqrt(CAST(tp + fn AS DOUBLE))
                        * sqrt(CAST(tn + fp AS DOUBLE))
                        * sqrt(CAST(tn + fn AS DOUBLE))), 6) AS mcc
        FROM conf
    """,
    tags=("ML-eval",),
)
def ml_mcc_binary_gate(spark, sf_dir):
    """Matthews correlation coefficient (plus precision/recall/F1) for
    the fixed binary rule "discount ≥ 6% predicts a returned line"
    against the l_returnflag='R' truth — the single-number classifier
    audit that, unlike F1, stays honest under class imbalance
    (completes ml_confusion_matrix, which reports the matrix without
    the coefficient).

    Exactness: the float discount snaps to integer percent before the
    threshold (no float compares); TP/FP/FN/TN are exact BIGINTs from
    ONE conditional aggregate; MCC's denominator multiplies the four
    marginal square roots SEPARATELY — tp·tn and fp·fn are the only
    products formed (≤ n²; int64-safe through ~3e9 rows, DECIMAL swap
    documented in stats_cohens_kappa) and sqrt(a)·sqrt(b)·sqrt(c)·
    sqrt(d) avoids forming the n⁴ product that would overflow ANY
    fixed-width integer.  One fixed float expression per metric,
    rounded once.

    100 TB posture: a single map-side-combined 4-accumulator pass —
    the cheapest possible full-corpus audit; the final row is
    driver-free arithmetic."""
    li = load_table(spark, sf_dir, "lineitem")
    truth = F.col("l_returnflag") == "R"
    pred = nan_to_null(F.round(F.col("l_discount") * 100, 0)).cast("bigint") >= 6
    conf = li.agg(
        F.sum(F.when(truth & pred, 1).otherwise(0)).cast("bigint").alias("tp"),
        F.sum(F.when(~truth & pred, 1).otherwise(0)).cast("bigint").alias("fp"),
        F.sum(F.when(truth & ~pred, 1).otherwise(0)).cast("bigint").alias("fn"),
        F.sum(F.when(~truth & ~pred, 1).otherwise(0)).cast("bigint").alias("tn"),
    )
    tp, fp, fn_, tn = F.col("tp"), F.col("fp"), F.col("fn"), F.col("tn")
    return conf.select(
        tp,
        fp,
        fn_,
        tn,
        # try_divide (round-12 degenerate sweep): an empty margin (no
        # predicted or no actual positives) makes each ratio the
        # defined NULL on both engines, never DIVIDE_BY_ZERO
        F.round(F.try_divide(tp.cast("double"), tp + fp), 6).alias("precision_"),
        F.round(F.try_divide(tp.cast("double"), tp + fn_), 6).alias("recall_"),
        F.round(F.try_divide(2.0 * tp, 2.0 * tp + fp + fn_), 6).alias("f1"),
        F.round(
            F.try_divide(
                tp.cast("double") * tn - fp.cast("double") * fn_,
                F.sqrt((tp + fp).cast("double"))
                * F.sqrt((tp + fn_).cast("double"))
                * F.sqrt((tn + fp).cast("double"))
                * F.sqrt((tn + fn_).cast("double")),
            ),
            6,
        ).alias("mcc"),
    )


@register(
    "stats_grubbs_extreme",
    oracle="""
        WITH m AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS s1,
                   CAST(SUM(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                                 AS DECIMAL(38,0))
                            * CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS DOUBLE)
                       AS s2,
                   CAST(MAX(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS mx,
                   CAST(MIN(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS mn
            FROM orders
        )
        SELECT n,
               ROUND(CAST(s1 AS DOUBLE) / n / 100, 6) AS mean_price,
               ROUND(sqrt((s2 - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)) / 100, 6)
                   AS stddev_price,
               ROUND(CAST(mx AS DOUBLE) / 100, 2) AS max_price,
               ROUND(CAST(mn AS DOUBLE) / 100, 2) AS min_price,
               ROUND((mx - CAST(s1 AS DOUBLE) / n)
                     / sqrt((s2 - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)), 6)
                   AS g_high,
               ROUND((CAST(s1 AS DOUBLE) / n - mn)
                     / sqrt((s2 - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)), 6)
                   AS g_low
        FROM m
    """,
    tags=("STATS-tests",),
)
def stats_grubbs_extreme(spark, sf_dir):
    """Grubbs extreme-studentized-deviate statistics for o_totalprice:
    how many sample standard deviations the most extreme high and low
    order sit from the mean — the single-outlier screen run before
    trusting a mean-based metric (complements dq_outlier_iqr's
    rank-based fences with the parametric test statistic).

    Exactness: prices become exact integer CENTS; n, Σx, max, min are
    BIGINT and Σx² accumulates as DECIMAL(38,0) (cents² ~2.6e15 ×
    1.5e6 rows at sf1 ≈ 4e21 — far inside 38 digits through any
    realistic corpus) before ONE cast to double; both Grubbs ratios
    are fixed float expressions of the five exact numbers, identical
    in both engines, rounded once at 6 dp.

    100 TB posture: one map-side-combined pass, five accumulators, a
    1-row result — max/min/mean/variance all ride the same exchange."""
    o = load_table(spark, sf_dir, "orders")
    c = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    m = o.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(c).cast("bigint").alias("s1"),
        F.sum(c.cast("decimal(38,0)") * c).cast("double").alias("s2"),
        F.max(c).cast("bigint").alias("mx"),
        F.min(c).cast("bigint").alias("mn"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    mx, mn = F.col("mx"), F.col("mn")
    # try_divide (round-12 degenerate sweep): a 1-row corpus zeroes
    # n−1, an all-equal corpus zeroes sd — defined NULL on both engines
    sd = F.sqrt(F.try_divide(s2 - s1.cast("double") * s1 / n, n - 1))
    return m.select(
        n,
        F.round(s1.cast("double") / n / 100, 6).alias("mean_price"),
        F.round(sd / 100, 6).alias("stddev_price"),
        F.round(mx.cast("double") / 100, 2).alias("max_price"),
        F.round(mn.cast("double") / 100, 2).alias("min_price"),
        F.round(F.try_divide(mx - s1.cast("double") / n, sd), 6).alias("g_high"),
        F.round(F.try_divide(s1.cast("double") / n - mn, sd), 6).alias("g_low"),
    )


@register(
    "stats_bh_fdr",
    oracle="""
        WITH per AS (
            SELECT p_brand AS brand,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s1,
                   CAST(SUM(CAST(l_quantity AS BIGINT)
                            * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s2
            FROM lineitem JOIN part ON l_partkey = p_partkey
            -- complete-case: NULL quantities are not observations (r12)
            WHERE l_quantity IS NOT NULL
            GROUP BY p_brand
        ),
        tot AS (
            SELECT CAST(SUM(n) AS BIGINT) AS nt,
                   CAST(SUM(s1) AS BIGINT) AS t1,
                   CAST(SUM(s2) AS BIGINT) AS t2,
                   CAST(COUNT(*) AS BIGINT) AS m
            FROM per
        ),
        z AS (
            SELECT brand, n, nt - n AS nr, m,
                   CAST(s1 AS DOUBLE) / n AS mb,
                   CAST(t1 - s1 AS DOUBLE) / (nt - n) AS mr,
                   (s2 - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1) AS vb,
                   ((t2 - s2) - CAST(t1 - s1 AS DOUBLE) * (t1 - s1) / (nt - n))
                       / (nt - n - 1) AS vr
            FROM per CROSS JOIN tot
        ),
        p AS (
            SELECT brand, n, m,
                   ROUND((mb - mr) / sqrt(vb / n + vr / nr), 6) AS z_welch,
                   CAST(ROUND(exp(-((mb - mr) / sqrt(vb / n + vr / nr))
                                  * ((mb - mr) / sqrt(vb / n + vr / nr)) / 2),
                              9) AS DECIMAL(18,9)) AS p_bound
            FROM z
        ),
        ranked AS (
            -- NULLS FIRST pins the engines' divergent defaults (r12):
            -- an undefined p (degenerate arm) ranks ahead on both
            SELECT brand, n, m, z_welch, p_bound,
                   CAST(ROW_NUMBER() OVER (ORDER BY p_bound NULLS FIRST, brand)
                        AS BIGINT) AS p_rank
            FROM p
        ),
        kstar AS (
            SELECT COALESCE(MAX(CASE WHEN CAST(p_bound AS DOUBLE)
                                          <= 0.10 * p_rank / m
                                     THEN p_rank END), 0) AS k
            FROM ranked
        )
        SELECT brand, n, z_welch,
               CAST(p_bound AS DOUBLE) AS p_bound, p_rank,
               ROUND(0.10 * p_rank / m, 9) AS bh_threshold,
               p_rank <= k AS rejected
        FROM ranked CROSS JOIN kstar
        ORDER BY p_rank
    """,
    tags=("STATS-multiplicity",),
)
def stats_bh_fdr(spark, sf_dir):
    """Benjamini–Hochberg FDR control over the 25-brand family of
    Welch z-tests "does this brand's mean order quantity differ from
    the rest of the catalog?" — the multiple-comparisons step every
    per-segment metrics dashboard needs before flagging segments
    (step-up procedure: reject the k smallest p-values where k is the
    LARGEST rank with p_(k) ≤ α·k/m, α = 0.10).

    The per-test "p-value" is the Gaussian Chernoff tail bound
    exp(−z²/2) — monotone in |z| (so the BH ordering and rejection
    SET equal those of the exact two-sided normal p up to the
    documented threshold calibration) and, unlike Φ, an expression
    both engines evaluate bit-identically (neither Spark SQL nor
    DuckDB exposes erf; policy §7.2 forbids per-engine special
    functions).

    Exactness: quantity moments per brand are exact BIGINTs from ONE
    lineitem⋈part aggregation; complement moments are exact
    subtractions of the 25-row totals (no second scan); z and the
    bound are fixed float expressions rounded once (6 dp / 9 dp into
    DECIMAL so the rank ORDER BY compares exact decimals, brand as
    total tiebreaker); k* is a MAX over the 25-row frame.

    100 TB posture: part broadcasts into lineitem (brand is the only
    column kept), one map-side-combined aggregation to 25 groups, and
    the whole BH machinery — ranking, thresholds, k*, rejection —
    runs on that broadcast-sized frame.  Σq² ≤ 2500·n stays inside
    int64 through ~3.6e15 rows."""
    from pyspark.sql import Window

    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity").isNotNull())  # complete-case (r12)
        .select("l_partkey", "l_quantity")
    )
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    q = nan_to_null("l_quantity").cast("bigint")
    per = (
        li.join(F.broadcast(pt), li["l_partkey"] == pt["p_partkey"])
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(q).cast("bigint").alias("s1"),
            F.sum(q * q).cast("bigint").alias("s2"),
        )
    )
    tot = per.agg(
        F.sum("n").cast("bigint").alias("nt"),
        F.sum("s1").cast("bigint").alias("t1"),
        F.sum("s2").cast("bigint").alias("t2"),
        F.count(F.lit(1)).cast("bigint").alias("m"),
    )
    j = per.crossJoin(F.broadcast(tot))
    n, nt = F.col("n"), F.col("nt")
    s1, s2 = F.col("s1"), F.col("s2")
    t1, t2 = F.col("t1"), F.col("t2")
    # try_divide (round-12 degenerate sweep): a one-brand corpus zeroes
    # the rest-of-catalog arm (nt−n) and singleton arms zero n−1 —
    # z and the bound are the defined NULL on both engines then
    nr = nt - n
    mb = s1.cast("double") / n
    mr = F.try_divide((t1 - s1).cast("double"), nr)
    vb = F.try_divide(s2 - s1.cast("double") * s1 / n, n - 1)
    vr = F.try_divide(
        (t2 - s2) - F.try_divide((t1 - s1).cast("double") * (t1 - s1), nr), nr - 1
    )
    zexpr = F.try_divide(mb - mr, F.sqrt(vb / n + F.try_divide(vr, nr)))
    p = j.select(
        "brand",
        "n",
        "m",
        F.round(zexpr, 6).alias("z_welch"),
        F.round(F.exp(-zexpr * zexpr / 2), 9)
        .cast("decimal(18,9)")
        .alias("p_bound"),
    )
    ranked = p.withColumn(
        "p_rank",
        F.row_number().over(Window.orderBy("p_bound", "brand")).cast("bigint"),
    )
    kstar = ranked.agg(
        F.coalesce(
            F.max(
                F.when(
                    F.col("p_bound").cast("double")
                    <= 0.10 * F.col("p_rank") / F.col("m"),
                    F.col("p_rank"),
                )
            ),
            F.lit(0).cast("bigint"),
        ).alias("k")
    )
    return (
        ranked.crossJoin(F.broadcast(kstar))
        .select(
            "brand",
            "n",
            "z_welch",
            F.col("p_bound").cast("double").alias("p_bound"),
            "p_rank",
            F.round(0.10 * F.col("p_rank") / F.col("m"), 9).alias("bh_threshold"),
            (F.col("p_rank") <= F.col("k")).alias("rejected"),
        )
        .orderBy("p_rank")
    )


@register(
    "stats_ate_stratified",
    oracle="""
        WITH base AS (
            SELECT CASE WHEN CAST(l_quantity AS BIGINT) <= 16 THEN 'low'
                        WHEN CAST(l_quantity AS BIGINT) <= 33 THEN 'mid'
                        ELSE 'high' END AS stratum,
                   CASE WHEN CAST(ROUND(l_discount * 100, 0) AS BIGINT) >= 6
                        THEN 1 ELSE 0 END AS t,
                   CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
            FROM lineitem
        ),
        s AS (
            SELECT stratum,
                   CAST(COUNT(*) AS BIGINT) AS n_s,
                   CAST(SUM(t) AS BIGINT) AS n_t,
                   CAST(SUM(t * y) AS BIGINT) AS r_t,
                   CAST(SUM(1 - t) AS BIGINT) AS n_c,
                   CAST(SUM((1 - t) * y) AS BIGINT) AS r_c
            FROM base GROUP BY stratum
        ),
        tot AS (SELECT CAST(SUM(n_s) AS BIGINT) AS n FROM s),
        rows_ AS (
            SELECT stratum, n_s, n_t, n_c,
                   ROUND(CAST(r_t AS DOUBLE) / n_t, 6) AS rate_treated,
                   ROUND(CAST(r_c AS DOUBLE) / n_c, 6) AS rate_control,
                   ROUND(CAST(r_t AS DOUBLE) / n_t
                         - CAST(r_c AS DOUBLE) / n_c, 6) AS stratum_diff,
                   ROUND(CAST(n_s AS DOUBLE) / tot.n
                         * (CAST(r_t AS DOUBLE) / n_t
                            - CAST(r_c AS DOUBLE) / n_c), 9)
                       AS ate_contribution
            FROM s CROSS JOIN tot
        )
        SELECT stratum, n_s, n_t, n_c, rate_treated, rate_control,
               stratum_diff, ate_contribution
        FROM rows_
        UNION ALL
        SELECT 'ALL' AS stratum,
               CAST(SUM(n_s) AS BIGINT), CAST(SUM(n_t) AS BIGINT),
               CAST(SUM(n_c) AS BIGINT),
               CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
               CAST(NULL AS DOUBLE),
               ROUND(SUM(ate_contribution), 9)
        FROM rows_
        ORDER BY stratum
    """,
    tags=("STATS-causal",),
)
def stats_ate_stratified(spark, sf_dir):
    """Stratified (standardized) average-treatment-effect estimate:
    does a deep discount (≥6%) change the return rate, adjusting for
    quantity tercile as the confounder?  Per stratum the raw
    treated/control rate gap, weighted by stratum prevalence —
    algebraically identical to inverse-propensity weighting when the
    propensity model is saturated on the strata, so this IS the IPTW
    estimator for discrete confounders (completes
    ml_covariate_balance_smd, which checks balance but not the
    effect).

    Exactness: all cell counts come from ONE conditional aggregate
    (the ml_mcc_binary_gate discount snap); rates and contributions
    are fixed float expressions of exact BIGINTs rounded once; the
    ALL row is the exact sum of the 9-dp contribution decimals.

    100 TB posture: one map-side-combined pass to |strata| rows —
    the cheapest possible adjusted-effect estimate; the union'd
    summary row aggregates the 3-row frame, not the data."""
    li = load_table(spark, sf_dir, "lineitem")
    q = nan_to_null("l_quantity").cast("bigint")
    stratum = F.when(q <= 16, "low").when(q <= 33, "mid").otherwise("high")
    t = F.when(nan_to_null(F.round(F.col("l_discount") * 100, 0)).cast("bigint") >= 6, 1).otherwise(0)
    y = F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
    s = (
        li.select(stratum.alias("stratum"), t.alias("t"), y.alias("y"))
        .groupBy("stratum")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_s"),
            F.sum("t").cast("bigint").alias("n_t"),
            F.sum(F.col("t") * F.col("y")).cast("bigint").alias("r_t"),
            F.sum(1 - F.col("t")).cast("bigint").alias("n_c"),
            F.sum((1 - F.col("t")) * F.col("y")).cast("bigint").alias("r_c"),
        )
    )
    tot = s.agg(F.sum("n_s").cast("bigint").alias("n"))
    # try_divide (round-12 degenerate sweep): a stratum with no treated
    # or no control rows has an undefined arm rate — NULL on both
    # engines, and the stratum's ATE contribution is NULL with it
    rt = F.try_divide(F.col("r_t").cast("double"), F.col("n_t"))
    rc = F.try_divide(F.col("r_c").cast("double"), F.col("n_c"))
    rows = s.crossJoin(F.broadcast(tot)).select(
        "stratum",
        "n_s",
        "n_t",
        "n_c",
        F.round(rt, 6).alias("rate_treated"),
        F.round(rc, 6).alias("rate_control"),
        F.round(rt - rc, 6).alias("stratum_diff"),
        F.round(F.col("n_s").cast("double") / F.col("n") * (rt - rc), 9).alias(
            "ate_contribution"
        ),
    )
    summary = rows.agg(
        F.sum("n_s").cast("bigint").alias("n_s"),
        F.sum("n_t").cast("bigint").alias("n_t"),
        F.sum("n_c").cast("bigint").alias("n_c"),
        F.round(F.sum("ate_contribution"), 9).alias("ate_contribution"),
    ).select(
        F.lit("ALL").alias("stratum"),
        "n_s",
        "n_t",
        "n_c",
        F.lit(None).cast("double").alias("rate_treated"),
        F.lit(None).cast("double").alias("rate_control"),
        F.lit(None).cast("double").alias("stratum_diff"),
        "ate_contribution",
    )
    return rows.unionByName(summary).orderBy("stratum")


@register(
    "stats_diff_in_diff",
    oracle="""
        WITH base AS (
            SELECT CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g,
                   CASE WHEN o_orderdate >= TIMESTAMP '1997-01-01'
                        THEN 1 ELSE 0 END AS post,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                       AS y
            FROM orders JOIN customer ON o_custkey = c_custkey
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate <  TIMESTAMP '1998-01-01'
        ),
        cells AS (
            SELECT g, post,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(y) AS BIGINT) AS s1,
                   CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) AS DOUBLE) AS s2
            FROM base GROUP BY g, post
        ),
        m AS (
            SELECT g, post, n,
                   CAST(s1 AS DOUBLE) / n AS mean_c,
                   (s2 - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1) AS var_c
            FROM cells
        ),
        wide AS (
            SELECT
                (SELECT n FROM m WHERE g = 1 AND post = 0) AS n_t_pre,
                (SELECT n FROM m WHERE g = 1 AND post = 1) AS n_t_post,
                (SELECT n FROM m WHERE g = 0 AND post = 0) AS n_c_pre,
                (SELECT n FROM m WHERE g = 0 AND post = 1) AS n_c_post,
                (SELECT mean_c FROM m WHERE g = 1 AND post = 0) AS m_t_pre,
                (SELECT mean_c FROM m WHERE g = 1 AND post = 1) AS m_t_post,
                (SELECT mean_c FROM m WHERE g = 0 AND post = 0) AS m_c_pre,
                (SELECT mean_c FROM m WHERE g = 0 AND post = 1) AS m_c_post,
                (SELECT var_c / n FROM m WHERE g = 1 AND post = 0) AS v_t_pre,
                (SELECT var_c / n FROM m WHERE g = 1 AND post = 1) AS v_t_post,
                (SELECT var_c / n FROM m WHERE g = 0 AND post = 0) AS v_c_pre,
                (SELECT var_c / n FROM m WHERE g = 0 AND post = 1) AS v_c_post
        )
        SELECT n_t_pre, n_t_post, n_c_pre, n_c_post,
               ROUND((m_t_post - m_t_pre) / 100, 6) AS delta_treated,
               ROUND((m_c_post - m_c_pre) / 100, 6) AS delta_control,
               ROUND(((m_t_post - m_t_pre) - (m_c_post - m_c_pre)) / 100, 6)
                   AS did_estimate,
               ROUND(sqrt(v_t_pre + v_t_post + v_c_pre + v_c_post) / 100, 6)
                   AS did_se
        FROM wide
    """,
    tags=("STATS-causal",),
)
def stats_diff_in_diff(spark, sf_dir):
    """Two-period two-group difference-in-differences on mean order
    value: BUILDING-segment customers (treated) vs the rest, 1996
    (pre) vs 1997 (post) — the workhorse quasi-experimental estimator
    for "did the thing we changed for group T move their metric
    beyond the market trend", with the standard four-cell normal SE
    √(Σ var_cell/n_cell).

    Exactness: prices snap to cents; each of the four cells gets
    exact (n, Σy, Σy²-as-DECIMAL(38,0)) from ONE conditional
    aggregate after the broadcast customer join; means, the DiD
    contrast, and the delta-method SE are fixed float expressions of
    those twelve exact numbers, rounded once.

    100 TB posture: one fact scan (date-range partition-prunable) ⋈
    broadcast dimension → 4-cell aggregate; the pivot to wide runs on
    the 4-row frame via conditional MIN (no second scan)."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    g = F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0)
    post = F.when(
        F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"), 1
    ).otherwise(0)
    y = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    cells = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select(g.alias("g"), post.alias("post"), y.alias("y"))
        .groupBy("g", "post")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("y").cast("bigint").alias("s1"),
            F.sum(F.col("y").cast("decimal(38,0)") * F.col("y"))
            .cast("double")
            .alias("s2"),
        )
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    # try_divide (round-12 degenerate sweep): a one-row cell zeroes n−1
    m = cells.select(
        "g",
        "post",
        n,
        (s1.cast("double") / n).alias("mean_c"),
        F.try_divide(s2 - s1.cast("double") * s1 / n, n - 1).alias("var_c"),
    )

    def cell(gv, pv, col, alias):
        return F.min(
            F.when((F.col("g") == gv) & (F.col("post") == pv), F.col(col))
        ).alias(alias)

    wide = m.agg(
        cell(1, 0, "n", "n_t_pre"),
        cell(1, 1, "n", "n_t_post"),
        cell(0, 0, "n", "n_c_pre"),
        cell(0, 1, "n", "n_c_post"),
        cell(1, 0, "mean_c", "m_t_pre"),
        cell(1, 1, "mean_c", "m_t_post"),
        cell(0, 0, "mean_c", "m_c_pre"),
        cell(0, 1, "mean_c", "m_c_post"),
        F.min(
            F.when((F.col("g") == 1) & (F.col("post") == 0), F.col("var_c") / F.col("n"))
        ).alias("v_t_pre"),
        F.min(
            F.when((F.col("g") == 1) & (F.col("post") == 1), F.col("var_c") / F.col("n"))
        ).alias("v_t_post"),
        F.min(
            F.when((F.col("g") == 0) & (F.col("post") == 0), F.col("var_c") / F.col("n"))
        ).alias("v_c_pre"),
        F.min(
            F.when((F.col("g") == 0) & (F.col("post") == 1), F.col("var_c") / F.col("n"))
        ).alias("v_c_post"),
    )
    dt = F.col("m_t_post") - F.col("m_t_pre")
    dc = F.col("m_c_post") - F.col("m_c_pre")
    return wide.select(
        "n_t_pre",
        "n_t_post",
        "n_c_pre",
        "n_c_post",
        F.round(dt / 100, 6).alias("delta_treated"),
        F.round(dc / 100, 6).alias("delta_control"),
        F.round((dt - dc) / 100, 6).alias("did_estimate"),
        F.round(
            F.sqrt(
                F.col("v_t_pre") + F.col("v_t_post") + F.col("v_c_pre") + F.col("v_c_post")
            )
            / 100,
            6,
        ).alias("did_se"),
    )


@register(
    "stats_odds_ratio_ci",
    oracle="""
        WITH conf AS (
            SELECT
                CAST(SUM(CASE WHEN l_returnflag = 'R'
                              AND CAST(ROUND(l_discount * 100, 0) AS BIGINT) >= 6
                              THEN 1 ELSE 0 END) AS BIGINT) AS a,
                CAST(SUM(CASE WHEN l_returnflag <> 'R'
                              AND CAST(ROUND(l_discount * 100, 0) AS BIGINT) >= 6
                              THEN 1 ELSE 0 END) AS BIGINT) AS b,
                CAST(SUM(CASE WHEN l_returnflag = 'R'
                              AND CAST(ROUND(l_discount * 100, 0) AS BIGINT) < 6
                              THEN 1 ELSE 0 END) AS BIGINT) AS c,
                CAST(SUM(CASE WHEN l_returnflag <> 'R'
                              AND CAST(ROUND(l_discount * 100, 0) AS BIGINT) < 6
                              THEN 1 ELSE 0 END) AS BIGINT) AS d
            FROM lineitem
        )
        SELECT a, b, c, d,
               ROUND(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c), 6)
                   AS odds_ratio,
               ROUND(ln(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c)), 6)
                   AS log_or,
               ROUND(sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d), 6) AS se_log_or,
               ROUND(exp(ln(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
                         - 1.959964 * sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d)), 6)
                   AS or_ci_lo,
               ROUND(exp(ln(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
                         + 1.959964 * sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d)), 6)
                   AS or_ci_hi,
               ROUND((CAST(a AS DOUBLE) / (a + b))
                     / (CAST(c AS DOUBLE) / (c + d)), 6) AS relative_risk
        FROM conf
    """,
    tags=("STATS-2x2",),
)
def stats_odds_ratio_ci(spark, sf_dir):
    """Odds ratio with the Woolf 95% log-normal confidence interval
    (plus relative risk) for the 2×2 table "deep discount (≥6%) ×
    returned line" — the epidemiology/AB-analysis companion to
    stats_two_proportion_z: OR with CI exp(ln OR ± z·√(1/a+1/b+1/c+
    1/d)) is THE effect-size report for binary×binary exposure data.

    Exactness: the four cells are exact BIGINTs from ONE conditional
    aggregate (the ml_mcc_binary_gate discount snap); OR, its log,
    the Woolf SE, and both CI bounds are fixed float expressions
    with the z constant 1.959964 written as the SAME literal in both
    engines, rounded once.

    100 TB posture: a single map-side-combined 4-accumulator pass;
    all statistics are driver-free arithmetic on the 1-row frame.
    Zero cells (possible on filtered corpora) would need the
    Haldane–Anscombe +0.5 correction — on TPC-H every cell is
    populated; documenting rather than silently correcting keeps the
    estimator the textbook one."""
    li = load_table(spark, sf_dir, "lineitem")
    truth = F.col("l_returnflag") == "R"
    exposed = nan_to_null(F.round(F.col("l_discount") * 100, 0)).cast("bigint") >= 6
    conf = li.agg(
        F.sum(F.when(truth & exposed, 1).otherwise(0)).cast("bigint").alias("a"),
        F.sum(F.when(~truth & exposed, 1).otherwise(0)).cast("bigint").alias("b"),
        F.sum(F.when(truth & ~exposed, 1).otherwise(0)).cast("bigint").alias("c"),
        F.sum(F.when(~truth & ~exposed, 1).otherwise(0)).cast("bigint").alias("d"),
    )
    # try_divide (round-12 degenerate sweep): any empty 2×2 cell zeroes
    # a divisor — OR/SE/RR are the defined NULL on both engines
    a, b, c, d = F.col("a"), F.col("b"), F.col("c"), F.col("d")
    or_ = F.try_divide(a.cast("double") * d, b.cast("double") * c)
    se = F.sqrt(
        F.try_divide(F.lit(1.0), a)
        + F.try_divide(F.lit(1.0), b)
        + F.try_divide(F.lit(1.0), c)
        + F.try_divide(F.lit(1.0), d)
    )
    z = F.lit(1.959964)
    return conf.select(
        a,
        b,
        c,
        d,
        F.round(or_, 6).alias("odds_ratio"),
        F.round(F.log(or_), 6).alias("log_or"),
        F.round(se, 6).alias("se_log_or"),
        F.round(F.exp(F.log(or_) - z * se), 6).alias("or_ci_lo"),
        F.round(F.exp(F.log(or_) + z * se), 6).alias("or_ci_hi"),
        F.round(
            F.try_divide(
                F.try_divide(a.cast("double"), a + b),
                F.try_divide(c.cast("double"), c + d),
            ),
            6,
        ).alias("relative_risk"),
    )


@register(
    "stats_mcnemar_paired",
    oracle="""
        WITH paired AS (
            SELECT CASE WHEN CAST(l_quantity AS BIGINT) > 25
                        THEN 1 ELSE 0 END AS pred_a,
                   CASE WHEN CAST(ROUND(l_discount * 100, 0) AS BIGINT) >= 5
                        THEN 1 ELSE 0 END AS pred_b
            FROM lineitem
        ),
        cells AS (
            SELECT
                CAST(SUM(CASE WHEN pred_a = 1 AND pred_b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n11,
                CAST(SUM(CASE WHEN pred_a = 1 AND pred_b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n10,
                CAST(SUM(CASE WHEN pred_a = 0 AND pred_b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n01,
                CAST(SUM(CASE WHEN pred_a = 0 AND pred_b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n00
            FROM paired
        )
        SELECT n11, n10, n01, n00,
               n10 + n01 AS n_discordant,
               ROUND(CAST((n10 - n01) * (n10 - n01) AS DOUBLE)
                     / (n10 + n01), 6) AS mcnemar_chi2,
               ROUND((abs(CAST(n10 AS DOUBLE) - n01) - 1.0)
                     * (abs(CAST(n10 AS DOUBLE) - n01) - 1.0)
                     / (n10 + n01), 6) AS mcnemar_chi2_corrected,
               ROUND(CAST(n10 AS DOUBLE) / n01, 6) AS discordant_odds
        FROM cells
    """,
    tags=("STATS-paired",),
)
def stats_mcnemar_paired(spark, sf_dir):
    """McNemar's test for PAIRED binary raters: do the two fixed rules
    "quantity > 25" and "discount ≥ 5%" fire at the same marginal rate
    on the same rows?  Unlike the chi-square independence test (which
    compares unpaired groups), McNemar uses only the DISCORDANT cells:
    χ² = (n₁₀−n₀₁)²/(n₁₀+n₀₁), with the Edwards continuity-corrected
    variant — the standard way to compare two classifiers evaluated on
    one dataset (Dietterich 1998).

    Exactness: the 2×2 paired table is ONE conditional aggregate of
    exact BIGINTs (discount snapped to integer percent first); the
    statistic, its corrected form, and the discordant odds are fixed
    float expressions rounded once.  (n₁₀−n₀₁)² ≤ n² — int64-safe to
    ~3e9 rows, DECIMAL(38,0) swap documented past that
    (stats_cohens_kappa precedent).

    100 TB posture: one map-side-combined 4-accumulator pass; the
    result is a 1-row frame of driver-free arithmetic."""
    li = load_table(spark, sf_dir, "lineitem")
    pa = F.when(nan_to_null("l_quantity").cast("bigint") > 25, 1).otherwise(0)
    pb = F.when(nan_to_null(F.round(F.col("l_discount") * 100, 0)).cast("bigint") >= 5, 1).otherwise(
        0
    )
    cells = li.select(pa.alias("pa"), pb.alias("pb")).agg(
        F.sum(F.when((F.col("pa") == 1) & (F.col("pb") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("n11"),
        F.sum(F.when((F.col("pa") == 1) & (F.col("pb") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("n10"),
        F.sum(F.when((F.col("pa") == 0) & (F.col("pb") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("n01"),
        F.sum(F.when((F.col("pa") == 0) & (F.col("pb") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("n00"),
    )
    n10, n01 = F.col("n10"), F.col("n01")
    return cells.select(
        "n11",
        "n10",
        "n01",
        "n00",
        (n10 + n01).alias("n_discordant"),
        # try_divide (round-12 degenerate sweep): zero discordant pairs
        # make McNemar undefined — NULL on both engines
        F.round(
            F.try_divide(((n10 - n01) * (n10 - n01)).cast("double"), n10 + n01), 6
        ).alias("mcnemar_chi2"),
        F.round(
            F.try_divide(
                (F.abs(n10.cast("double") - n01) - 1.0)
                * (F.abs(n10.cast("double") - n01) - 1.0),
                n10 + n01,
            ),
            6,
        ).alias("mcnemar_chi2_corrected"),
        F.round(F.try_divide(n10.cast("double"), n01), 6).alias("discordant_odds"),
    )


#: Hill estimator order-statistic count
HILL_K = 100


@register(
    "stats_hill_tail_index",
    oracle=f"""
        WITH cents AS (
            SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                       AS x,
                   o_orderkey
            FROM orders
        ),
        topk AS (
            SELECT x, ROW_NUMBER() OVER (ORDER BY x DESC, o_orderkey) AS rnk
            FROM cents
            ORDER BY x DESC, o_orderkey
            LIMIT {HILL_K + 1}
        ),
        thresh AS (SELECT x AS xk FROM topk WHERE rnk = {HILL_K + 1}),
        terms AS (
            SELECT CAST(ROUND(ln(CAST(t.x AS DOUBLE) / th.xk), 9)
                        AS DECIMAL(28,9)) AS term
            FROM topk t CROSS JOIN thresh th
            WHERE t.rnk <= {HILL_K}
        )
        SELECT {HILL_K} AS k,
               ROUND((SELECT CAST(xk AS DOUBLE) / 100 FROM thresh), 2)
                   AS threshold_price,
               ROUND(CAST(SUM(term) AS DOUBLE) / {HILL_K}, 6) AS hill_gamma,
               ROUND({HILL_K} / CAST(SUM(term) AS DOUBLE), 6) AS tail_alpha
        FROM terms
    """,
    tags=("STATS-evt",),
)
def stats_hill_tail_index(spark, sf_dir):
    """Hill estimator of the price distribution's tail index from the
    top k=100 order statistics: γ̂ = (1/k)Σᵢ ln(x₍ᵢ₎/x₍ₖ₊₁₎), and
    α̂ = 1/γ̂ — the extreme-value-theory number behind "how heavy is
    the tail" decisions (α < 2 ⇒ infinite variance ⇒ mean-based
    monitors lie; complements text_zipf_fit, which fits the rank-
    frequency law rather than the upper tail).

    Exactness: prices snap to exact cents; the top-(k+1) slice is a
    TakeOrderedAndProject with orderkey tiebreak (the F2 idiom — no
    global sort, no full rank); each log-ratio is rounded once to
    9 dp into DECIMAL so the k-term sum is order-free; γ̂ and α̂ are
    single divisions.

    100 TB posture: the only data-sized stage is the top-k+1
    selection — per-partition heaps then a 101-row merge on
    the driver-free reduce path; everything downstream runs on a
    bounded frame.  k scales the estimator's bias/variance tradeoff,
    not the scan count."""
    o = load_table(spark, sf_dir, "orders")
    cents = o.select(
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("x"),
        "o_orderkey",
    )
    from pyspark.sql import Window

    topk = (
        cents.orderBy(F.col("x").desc(), "o_orderkey")
        .limit(HILL_K + 1)
        .select(
            "x",
            F.row_number()
            .over(Window.orderBy(F.col("x").desc(), "o_orderkey"))
            .alias("rnk"),
        )
    )
    thresh = topk.where(F.col("rnk") == HILL_K + 1).select(F.col("x").alias("xk"))
    terms = (
        topk.where(F.col("rnk") <= HILL_K)
        .crossJoin(F.broadcast(thresh))
        .select(
            F.round(F.log(F.col("x").cast("double") / F.col("xk")), 9)
            .cast("decimal(28,9)")
            .alias("term"),
            "xk",
        )
    )
    # GLOBAL aggregate (round-12 degenerate sweep): grouping by xk
    # emits zero rows when the corpus is empty or smaller than k+1,
    # while the oracle's FROM-less outer SELECT always emits the
    # one-row summary with NULLs; xk is group-constant so first() is
    # deterministic, and the nullif guards make 0-sums a defined NULL
    # on both engines (DuckDB double/0 is NULL).
    s = F.sum("term").cast("double")
    return terms.agg(
        F.first("xk").alias("xk"),
        F.round(s / HILL_K, 6).alias("hill_gamma"),
        F.round(F.lit(float(HILL_K)) / F.nullif(s, F.lit(0.0)), 6).alias("tail_alpha"),
    ).select(
        F.lit(HILL_K).cast("bigint").alias("k"),
        F.round(F.col("xk").cast("double") / 100, 2).alias("threshold_price"),
        "hill_gamma",
        "tail_alpha",
    )


@register(
    "stats_capture_recapture",
    oracle="""
        WITH flags AS (
            SELECT o_custkey,
                   MAX(CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01'
                             AND o_orderdate < TIMESTAMP '1997-01-01'
                            THEN 1 ELSE 0 END) AS s1,
                   MAX(CASE WHEN o_orderdate >= TIMESTAMP '1997-01-01'
                             AND o_orderdate < TIMESTAMP '1998-01-01'
                            THEN 1 ELSE 0 END) AS s2
            FROM orders GROUP BY o_custkey
        ),
        m AS (
            SELECT CAST(SUM(s1) AS BIGINT) AS n1,
                   CAST(SUM(s2) AS BIGINT) AS n2,
                   CAST(SUM(s1 * s2) AS BIGINT) AS m12,
                   CAST(SUM(CASE WHEN s1 = 1 OR s2 = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS observed
            FROM flags
        )
        SELECT n1, n2, m12, observed,
               ROUND(CAST(n1 AS DOUBLE) * n2 / m12, 6) AS lincoln_petersen,
               ROUND((n1 + 1.0) * (n2 + 1.0) / (m12 + 1.0) - 1.0, 6)
                   AS chapman,
               ROUND(sqrt((n1 + 1.0) * (n2 + 1.0)
                          * (n1 - CAST(m12 AS DOUBLE)) * (n2 - m12)
                          / ((m12 + 1.0) * (m12 + 1.0) * (m12 + 2.0))), 6)
                   AS chapman_se
        FROM m
    """,
    tags=("STATS-capture",),
)
def stats_capture_recapture(spark, sf_dir):
    """Two-sample capture–recapture (Lincoln–Petersen + the Chapman
    bias-corrected estimator with its SE): treat 1996 and 1997 active
    customers as two capture occasions and estimate the TOTAL
    population from the overlap — the mark-recapture method data
    teams reuse to estimate true entity counts behind incomplete
    extractions (how many real customers/entities exist given two
    partial snapshots; also the standard estimator for residual
    duplicates after a dedup pass: sample twice, count re-catches).

    Exactness: per-customer capture flags are exact 0/1 MAX
    aggregates from ONE date-pruned scan; n₁, n₂, m₁₂ and the
    observed union are exact BIGINTs; the three estimators are fixed
    float expressions rounded once.  Chapman is defined even at
    m₁₂=0; the Lincoln–Petersen ratio would need m₁₂>0 (guaranteed
    here, and the assumption to check is capture independence —
    documented, not silently corrected).

    100 TB posture: one map-side-combined pass to |customers| flags,
    then a 4-accumulator reduce to a 1-row frame."""
    o = load_table(spark, sf_dir, "orders")
    in96 = (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")) & (
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
    )
    in97 = (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp")) & (
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    flags = o.groupBy("o_custkey").agg(
        F.max(F.when(in96, 1).otherwise(0)).alias("s1"),
        F.max(F.when(in97, 1).otherwise(0)).alias("s2"),
    )
    m = flags.agg(
        F.sum("s1").cast("bigint").alias("n1"),
        F.sum("s2").cast("bigint").alias("n2"),
        F.sum(F.col("s1") * F.col("s2")).cast("bigint").alias("m12"),
        F.sum(F.when((F.col("s1") == 1) | (F.col("s2") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("observed"),
    )
    n1, n2, m12 = F.col("n1"), F.col("n2"), F.col("m12")
    return m.select(
        n1,
        n2,
        m12,
        "observed",
        # try_divide (round-12 degenerate sweep): zero overlap makes
        # Lincoln–Petersen undefined — NULL on both engines (Chapman
        # stays defined, as documented above)
        F.round(F.try_divide(n1.cast("double") * n2, m12), 6).alias(
            "lincoln_petersen"
        ),
        F.round((n1 + 1.0) * (n2 + 1.0) / (m12 + 1.0) - 1.0, 6).alias("chapman"),
        F.round(
            F.sqrt(
                (n1 + 1.0)
                * (n2 + 1.0)
                * (n1 - m12.cast("double"))
                * (n2 - m12)
                / ((m12 + 1.0) * (m12 + 1.0) * (m12 + 2.0))
            ),
            6,
        ).alias("chapman_se"),
    )


@register(
    "stats_cochran_q",
    oracle="""
        WITH rules AS (
            SELECT CASE WHEN CAST(l_quantity AS BIGINT) > 25 THEN 1 ELSE 0 END
                       AS r1,
                   CASE WHEN CAST(ROUND(l_discount * 100, 0) AS BIGINT) >= 5
                        THEN 1 ELSE 0 END AS r2,
                   CASE WHEN CAST(l_extendedprice AS DECIMAL(18,2)) > 30000
                        THEN 1 ELSE 0 END AS r3
            FROM lineitem
        ),
        m AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(r1) AS BIGINT) AS c1,
                   CAST(SUM(r2) AS BIGINT) AS c2,
                   CAST(SUM(r3) AS BIGINT) AS c3,
                   CAST(SUM(r1 + r2 + r3) AS BIGINT) AS sr,
                   CAST(SUM((r1 + r2 + r3) * (r1 + r2 + r3)) AS BIGINT) AS sr2
            FROM rules
        )
        SELECT n, c1, c2, c3,
               ROUND(2.0 * (3.0 * (CAST(c1 AS DOUBLE) * c1
                                   + CAST(c2 AS DOUBLE) * c2
                                   + CAST(c3 AS DOUBLE) * c3)
                            - CAST(sr AS DOUBLE) * sr)
                     / (3.0 * sr - sr2), 6) AS cochran_q
        FROM m
    """,
    tags=("STATS-paired",),
)
def stats_cochran_q(spark, sf_dir):
    """Cochran's Q — the k-treatment generalization of McNemar: do
    THREE binary rules (quantity > 25, discount ≥ 5%, price > $30k)
    fire at the same marginal rate on the same rows?  Q = (k−1)·
    (k·ΣC_j² − (ΣC_j)²)/(k·ΣR_i − ΣR_i²) with row sums R_i ∈ {0..k},
    ~χ²(k−1) under the null — the screen run before pairwise McNemars
    (stats_mcnemar_paired is the k=2 cell of this family).

    Exactness: column totals, ΣR and ΣR² are exact BIGINTs from ONE
    conditional aggregate (R_i enters as the per-row integer sum, so
    no per-row float ever exists); Q is a single fixed float
    expression rounded once.  ΣC² ≤ n² — int64-safe through ~3e9
    rows; the documented DECIMAL(38,0) swap applies past that.

    100 TB posture: one map-side-combined pass, six accumulators, a
    1-row result."""
    li = load_table(spark, sf_dir, "lineitem")
    r1 = F.when(nan_to_null("l_quantity").cast("bigint") > 25, 1).otherwise(0)
    r2 = F.when(nan_to_null(F.round(F.col("l_discount") * 100, 0)).cast("bigint") >= 5, 1).otherwise(0)
    r3 = F.when(F.col("l_extendedprice").cast("decimal(18,2)") > 30000, 1).otherwise(0)
    rs = r1 + r2 + r3
    m = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(r1).cast("bigint").alias("c1"),
        F.sum(r2).cast("bigint").alias("c2"),
        F.sum(r3).cast("bigint").alias("c3"),
        F.sum(rs).cast("bigint").alias("sr"),
        F.sum(rs * rs).cast("bigint").alias("sr2"),
    )
    c1, c2, c3 = F.col("c1"), F.col("c2"), F.col("c3")
    sr, sr2 = F.col("sr"), F.col("sr2")
    # try_divide (round-12 degenerate sweep): if every row's three
    # rules agree (R_i ∈ {0,3}), 3·ΣR−ΣR² is 0 — Q is NULL then
    q = F.try_divide(
        2.0
        * (
            3.0 * (c1.cast("double") * c1 + c2.cast("double") * c2 + c3.cast("double") * c3)
            - sr.cast("double") * sr
        ),
        3.0 * sr - sr2,
    )
    return m.select("n", c1, c2, c3, F.round(q, 6).alias("cochran_q"))


#: O'Brien–Fleming two-sided boundaries for K=5 equally-spaced looks
#: at overall alpha=0.05 (Pocock/OBF tables — fixed literals, both
#: engines compare against the same doubles)
OBF_BOUNDS = (4.877, 3.357, 2.680, 2.290, 2.031)


@register(
    "stats_group_sequential_looks",
    oracle=f"""
        WITH cells AS (
            SELECT CAST(month(o_orderdate) AS BIGINT) AS look,
                   CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END AS t,
                   CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1996-06-01'
        ),
        per_month AS (
            SELECT look,
                   CAST(SUM(t) AS BIGINT) AS nt,
                   CAST(SUM(t * y) AS BIGINT) AS yt,
                   CAST(SUM(1 - t) AS BIGINT) AS nc,
                   CAST(SUM((1 - t) * y) AS BIGINT) AS yc
            FROM cells GROUP BY look
        ),
        cum AS (
            SELECT look,
                   CAST(SUM(nt) OVER (ORDER BY look) AS BIGINT) AS nt,
                   CAST(SUM(yt) OVER (ORDER BY look) AS BIGINT) AS yt,
                   CAST(SUM(nc) OVER (ORDER BY look) AS BIGINT) AS nc,
                   CAST(SUM(yc) OVER (ORDER BY look) AS BIGINT) AS yc
            FROM per_month
        ),
        z AS (
            SELECT look, nt, nc,
                   ROUND((CAST(yt AS DOUBLE) / nt - CAST(yc AS DOUBLE) / nc)
                         / sqrt((CAST(yt + yc AS DOUBLE) / (nt + nc))
                                * (1.0 - CAST(yt + yc AS DOUBLE) / (nt + nc))
                                * (1.0 / nt + 1.0 / nc)), 6) AS z_k,
                   CASE look {' '.join(f"WHEN {k + 1} THEN {b!r}" for k, b in enumerate(OBF_BOUNDS))} END
                       AS boundary
            FROM cum
        )
        SELECT look, nt AS n_treated, nc AS n_control, z_k, boundary,
               (abs(z_k) >= boundary) AS crossed,
               (SELECT MIN(look) FROM z z2
                WHERE abs(z2.z_k) >= z2.boundary) AS first_crossing_look
        FROM z
        ORDER BY look
    """,
    tags=("STATS-sequential",),
)
def stats_group_sequential_looks(spark, sf_dir):
    """Group-sequential A/B monitoring with O'Brien–Fleming stopping
    boundaries: the two-proportion z statistic (does high order
    priority shift the F-status rate?) evaluated at FIVE cumulative
    monthly interim looks over 1996-H1, each |z_k| compared against
    its OBF boundary (4.877 → 2.031; spend almost nothing early, the
    final look costs ≈ the fixed test) — the peeking-safe experiment
    readout, versus the naive repeated z-test that inflates false
    positives ~3×.

    Exactness: per-month cells are exact BIGINTs from ONE conditional
    aggregate; cumulative looks are exact sums over the 5-row month
    frame; z_k is one fixed float expression rounded once; the
    boundaries are injected literals from the published OBF table.

    100 TB posture: one date-pruned scan to a 5-row frame — the
    entire sequential machinery (cumulation, boundaries, first-
    crossing) is frame arithmetic; more looks = more rows in the
    month frame, never more passes."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-06-01").cast("timestamp"))
    )
    t = F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0)
    y = F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
    per_month = (
        o.select(F.month("o_orderdate").cast("bigint").alias("look"), t.alias("t"), y.alias("y"))
        .groupBy("look")
        .agg(
            F.sum("t").cast("bigint").alias("nt"),
            F.sum(F.col("t") * F.col("y")).cast("bigint").alias("yt"),
            F.sum(1 - F.col("t")).cast("bigint").alias("nc"),
            F.sum((1 - F.col("t")) * F.col("y")).cast("bigint").alias("yc"),
        )
    )
    wc = Window.orderBy("look").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_month.select(
        "look",
        F.sum("nt").over(wc).cast("bigint").alias("nt"),
        F.sum("yt").over(wc).cast("bigint").alias("yt"),
        F.sum("nc").over(wc).cast("bigint").alias("nc"),
        F.sum("yc").over(wc).cast("bigint").alias("yc"),
    )
    nt, yt, nc, yc = F.col("nt"), F.col("yt"), F.col("nc"), F.col("yc")
    pool = (yt + yc).cast("double") / (nt + nc)
    zk = F.round(
        (yt.cast("double") / nt - yc.cast("double") / nc)
        / F.sqrt(pool * (1.0 - pool) * (1.0 / nt + 1.0 / nc)),
        6,
    )
    bound = F.col("look")
    bexpr = None
    for k, b in enumerate(OBF_BOUNDS, start=1):
        bexpr = (
            F.when(bound == k, F.lit(b)) if bexpr is None else bexpr.when(bound == k, F.lit(b))
        )
    z = cum.select(
        "look",
        nt.alias("n_treated"),
        nc.alias("n_control"),
        zk.alias("z_k"),
        bexpr.alias("boundary"),
    ).persist()
    first = z.agg(
        F.min(F.when(F.abs(F.col("z_k")) >= F.col("boundary"), F.col("look"))).alias(
            "first_crossing_look"
        )
    )
    return (
        z.crossJoin(F.broadcast(first))
        .select(
            "look",
            "n_treated",
            "n_control",
            "z_k",
            "boundary",
            (F.abs(F.col("z_k")) >= F.col("boundary")).alias("crossed"),
            "first_crossing_look",
        )
        .orderBy("look")
    )


@register(
    "stats_bayes_beta_binomial",
    oracle="""
        WITH b AS (
            SELECT p_brand AS brand,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                        AS BIGINT) AS s
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand
        )
        SELECT brand, n, s,
               ROUND(CAST(s AS DOUBLE) / n, 6) AS mle_rate,
               ROUND((s + 1.0) / (n + 2.0), 6) AS posterior_mean,
               ROUND(sqrt((s + 1.0) * (n - s + 1.0)
                          / ((n + 2.0) * (n + 2.0) * (n + 3.0))), 6)
                   AS posterior_sd,
               ROUND((s + 1.0) / (n + 2.0)
                     - 1.959964 * sqrt((s + 1.0) * (n - s + 1.0)
                          / ((n + 2.0) * (n + 2.0) * (n + 3.0))), 6)
                   AS cred_lo,
               ROUND((s + 1.0) / (n + 2.0)
                     + 1.959964 * sqrt((s + 1.0) * (n - s + 1.0)
                          / ((n + 2.0) * (n + 2.0) * (n + 3.0))), 6)
                   AS cred_hi
        FROM b
        ORDER BY brand
    """,
    tags=("STATS-bayes",),
)
def stats_bayes_beta_binomial(spark, sf_dir):
    """Beta-binomial posterior for each brand's return rate under the
    uniform Beta(1,1) prior — the conjugate-Bayes rate table
    (posterior mean (s+1)/(n+2) = Laplace's rule of succession,
    exact Beta posterior sd, normal-approx 95% credible band) that a
    dashboard shows INSTEAD of raw MLE rates when some segments are
    small: the posterior is automatically regularized, and segments
    with little data visibly carry wide bands.

    Exactness: the per-brand (n, s) counts are exact BIGINTs from ONE
    lineitem⋈part aggregation; every posterior quantity is a fixed
    float expression of two integers (the Beta moments are closed
    form — no sampling, no special functions), rounded once.

    100 TB posture: part broadcasts; one map-side-combined aggregate
    to 25 rows; the Bayes arithmetic is frame-local.  Hierarchical
    priors fit on the same frame (see stats_empirical_bayes_shrinkage
    for the method-of-moments version)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_returnflag")
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    b = (
        li.join(F.broadcast(pt), li["l_partkey"] == pt["p_partkey"])
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("bigint")
            .alias("s"),
        )
    )
    n, s = F.col("n"), F.col("s")
    pm = (s + 1.0) / (n + 2.0)
    sd = F.sqrt((s + 1.0) * (n - s + 1.0) / ((n + 2.0) * (n + 2.0) * (n + 3.0)))
    z = F.lit(1.959964)
    return b.select(
        "brand",
        n,
        s,
        F.round(s.cast("double") / n, 6).alias("mle_rate"),
        F.round(pm, 6).alias("posterior_mean"),
        F.round(sd, 6).alias("posterior_sd"),
        F.round(pm - z * sd, 6).alias("cred_lo"),
        F.round(pm + z * sd, 6).alias("cred_hi"),
    ).orderBy("brand")


@register(
    "stats_empirical_bayes_shrinkage",
    oracle="""
        WITH b AS (
            SELECT p_brand AS brand,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                        AS BIGINT) AS s
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand
        ),
        g AS (
            SELECT CAST(SUM(s) AS BIGINT) AS st, CAST(SUM(n) AS BIGINT) AS nt,
                   CAST(COUNT(*) AS BIGINT) AS k,
                   CAST(SUM(CAST(ROUND(
                       (CAST(s AS DOUBLE) / n
                        - (SELECT CAST(SUM(s) AS DOUBLE) / SUM(n) FROM b))
                       * (CAST(s AS DOUBLE) / n
                          - (SELECT CAST(SUM(s) AS DOUBLE) / SUM(n) FROM b)), 12)
                       AS DECIMAL(28,12))) AS DOUBLE) AS ss_between,
                   CAST(SUM(CAST(ROUND(
                       CAST(s AS DOUBLE) / n * (1.0 - CAST(s AS DOUBLE) / n) / n,
                       12) AS DECIMAL(28,12))) AS DOUBLE) AS mean_within
            FROM b
        ),
        prior AS (
            SELECT CAST(st AS DOUBLE) / nt AS mu,
                   GREATEST(ss_between / (k - 1) - mean_within / k, 1e-12)
                       AS tau2
            FROM g
        )
        SELECT b.brand, b.n, b.s,
               ROUND(CAST(b.s AS DOUBLE) / b.n, 6) AS mle_rate,
               ROUND(p.mu, 6) AS prior_mean,
               ROUND(p.tau2 / (p.tau2 + p.mu * (1.0 - p.mu) / b.n), 6)
                   AS shrink_weight,
               ROUND(p.mu + p.tau2 / (p.tau2 + p.mu * (1.0 - p.mu) / b.n)
                     * (CAST(b.s AS DOUBLE) / b.n - p.mu), 6) AS eb_rate
        FROM b CROSS JOIN prior p
        ORDER BY b.brand
    """,
    tags=("STATS-bayes",),
)
def stats_empirical_bayes_shrinkage(spark, sf_dir):
    """Empirical-Bayes shrinkage of per-brand return rates toward the
    pooled mean — the James-Stein-style estimator behind 'small
    segments get pulled to the prior': the between-brand variance τ²
    is estimated from the data itself (method of moments: between-SS
    minus average within-brand sampling variance), and each brand's
    posterior is the precision-weighted blend
    μ + w·(p̂ − μ), w = τ²/(τ² + p̂ sampling var).  Big-n brands keep
    their MLE (w→1); a sparse brand would collapse to the pool.

    Exactness: counts are exact BIGINTs; the two prior moments are
    sums of per-brand float terms rounded to 12 dp into DECIMAL
    (order-free, the round-then-DECIMAL idiom over the 25-row
    frame); every output is one fixed float expression rounded once;
    τ² floors at 1e-12 so the weight stays defined when brands are
    homogeneous.

    100 TB posture: ONE data pass to the 25-row frame; the prior fit
    and the shrinkage are frame arithmetic — the whole hierarchical
    model costs nothing beyond the rate table itself."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_returnflag")
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    b = (
        li.join(F.broadcast(pt), li["l_partkey"] == pt["p_partkey"])
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("bigint")
            .alias("s"),
        )
        .persist()
    )
    tot = b.agg(
        F.sum("s").cast("bigint").alias("st"), F.sum("n").cast("bigint").alias("nt")
    )
    mu0 = F.col("st").cast("double") / F.col("nt")
    withmu = b.crossJoin(F.broadcast(tot)).select(
        "brand", "n", "s", mu0.alias("mu")
    )
    rate = F.col("s").cast("double") / F.col("n")
    g = withmu.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.max("mu").alias("mu"),
        F.sum(
            F.round((rate - F.col("mu")) * (rate - F.col("mu")), 12).cast(
                "decimal(28,12)"
            )
        )
        .cast("double")
        .alias("ss_between"),
        F.sum(
            F.round(rate * (1.0 - rate) / F.col("n"), 12).cast("decimal(28,12)")
        )
        .cast("double")
        .alias("mean_within"),
    )
    prior = g.select(
        "mu",
        F.greatest(
            F.col("ss_between") / (F.col("k") - 1) - F.col("mean_within") / F.col("k"),
            F.lit(1e-12),
        ).alias("tau2"),
    )
    w = F.col("tau2") / (
        F.col("tau2") + F.col("mu") * (1.0 - F.col("mu")) / F.col("n")
    )
    return (
        b.crossJoin(F.broadcast(prior))
        .select(
            "brand",
            "n",
            "s",
            F.round(rate, 6).alias("mle_rate"),
            F.round(F.col("mu"), 6).alias("prior_mean"),
            F.round(w, 6).alias("shrink_weight"),
            F.round(F.col("mu") + w * (rate - F.col("mu")), 6).alias("eb_rate"),
        )
        .orderBy("brand")
    )
