"""Rank-based statistics: Spearman, Kendall, one-way ANOVA (SURVEY §2
STATS family, round-8 wave).

Determinism (policy §7.2): every cross-row accumulation is exact —
integer doubled-average-ranks, integer concordance counts, DECIMAL
co-moments — and the only floats are one fixed final expression per
statistic, written identically in both engines.

Scale posture: Spearman's global average ranks come from the
``banded_running`` prefix machinery (per-DISTINCT-value frame, zero
unpartitioned Windows); Kendall runs on a bounded contingency grid
(|quantity values| x |price bands|, independent of row count) so the
all-pairs concordance join never touches row-level data; ANOVA is one
map-side-combined aggregate carrying three accumulators per group.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_builder_spark.folding import nan_to_null
from etl_builder_spark.registry import register
from etl_builder_spark.session import load_table
from etl_builder_spark.operators.stats import banded_running

D38 = "decimal(38,0)"


def _avg2_rank_map(df, col: str):
    """Per-distinct-value map v -> 2x(average rank of v ascending).

    Doubling keeps tied average ranks (half-integers) in exact BIGINT.
    Built on the per-distinct-value frame: |distinct| rows, prefix
    counts via banded_running — the proven no-unpartitioned-Window
    shape (stats_ks_two_sample_banded)."""
    per = (
        df.groupBy(F.col(col).alias("v"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .persist()  # banded_running references its input several times
    )
    r = banded_running(per, value_col="v", tiebreak_col="v", sum_col="cnt")
    # inclusive running count c over values <= v: ranks of the tie block
    # are (c-cnt+1)..c, averaging to (2c - cnt + 1)/2.
    return r.select("v", (2 * F.col("run_sum") - F.col("cnt") + 1).alias("avg2"))


@register(
    "stats_spearman_rho",
    oracle="""
        -- complete-case (round-12 nullmeasures sweep): NULL measures
        -- are not observations — dropped before ranking on both engines
        WITH cc AS (
            SELECT l_quantity, l_extendedprice FROM lineitem
            WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        ),
        xv AS (SELECT l_quantity AS v, CAST(COUNT(*) AS BIGINT) AS cnt
                    FROM cc GROUP BY 1),
        xm AS (SELECT v, 2 * SUM(cnt) OVER (ORDER BY v) - cnt + 1 AS avg2 FROM xv),
        yv AS (SELECT l_extendedprice AS v, CAST(COUNT(*) AS BIGINT) AS cnt
               FROM cc GROUP BY 1),
        ym AS (SELECT v, 2 * SUM(cnt) OVER (ORDER BY v) - cnt + 1 AS avg2 FROM yv),
        j AS (
            SELECT xm.avg2 AS rx, ym.avg2 AS ry
            FROM cc
            JOIN xm ON l_quantity = xm.v
            JOIN ym ON l_extendedprice = ym.v
        ),
        m AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(rx AS DECIMAL(38,0))) AS DOUBLE) AS sx,
                   CAST(SUM(CAST(ry AS DECIMAL(38,0))) AS DOUBLE) AS sy,
                   CAST(SUM(CAST(rx AS DECIMAL(38,0)) * rx) AS DOUBLE) AS sxx,
                   CAST(SUM(CAST(ry AS DECIMAL(38,0)) * ry) AS DOUBLE) AS syy,
                   CAST(SUM(CAST(rx AS DECIMAL(38,0)) * ry) AS DOUBLE) AS sxy
            FROM j
        )
        SELECT n AS n_rows,
               ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
                     / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx)
                        * sqrt(CAST(n AS DOUBLE) * syy - sy * sy)), 6)
                   AS spearman_rho
        FROM m
    """,
    tags=("STATS-rank",),
)
def stats_spearman_rho(spark, sf_dir):
    """Spearman rank correlation (quantity vs extended price) with the
    tie-correct Pearson-on-average-ranks formulation.  Average ranks
    are computed on the per-DISTINCT-value frame (doubled to stay in
    exact BIGINT through ties) and joined back to rows — never a
    600-billion-row global sort: the x map is 50 rows (broadcast), the
    y map is |distinct prices| rows via banded prefix sums.  The five
    rank co-moments sum in DECIMAL(38,0), so only the final rho
    expression is float — the stats_corr_pearson_exact discipline
    applied to ranks."""
    l = (
        load_table(spark, sf_dir, "lineitem")
        # complete-case (round-12 nullmeasures sweep): a NULL measure is
        # not an observation — both engines drop the row before ranking
        .where(F.col("l_quantity").isNotNull() & F.col("l_extendedprice").isNotNull())
        .select(F.col("l_quantity").alias("x"), F.col("l_extendedprice").alias("y"))
        .persist()  # one source scan feeds the base join and both rank maps
    )
    xm = _avg2_rank_map(l, "x").withColumnRenamed("avg2", "rx")
    ym = _avg2_rank_map(l, "y").withColumnRenamed("avg2", "ry")
    j = (
        l.join(F.broadcast(xm), l.x == xm.v)
        .drop("v")
        .join(ym, l.y == ym.v)
        .select("rx", "ry")
    )
    rxd = F.col("rx").cast(D38)
    ryd = F.col("ry").cast(D38)
    m = j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(rxd).cast("double").alias("sx"),
        F.sum(ryd).cast("double").alias("sy"),
        F.sum(rxd * F.col("rx")).cast("double").alias("sxx"),
        F.sum(ryd * F.col("ry")).cast("double").alias("syy"),
        F.sum(rxd * F.col("ry")).cast("double").alias("sxy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(nd * F.col("sxx") - F.col("sx") * F.col("sx")) * F.sqrt(
        nd * F.col("syy") - F.col("sy") * F.col("sy")
    )
    # try_divide (round-12 degenerate sweep): all-tied ranks in either
    # margin zero a variance — rho is the defined NULL on both engines
    return m.select(
        F.col("n").alias("n_rows"),
        F.round(F.try_divide(num, den), 6).alias("spearman_rho"),
    )


@register(
    "stats_kendall_tau_binned",
    oracle="""
        WITH cells AS (
            SELECT CAST(l_quantity AS BIGINT) AS qx,
                   CAST(FLOOR(l_extendedprice / 5000) AS BIGINT) AS yb,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM lineitem GROUP BY 1, 2
        ),
        conc AS (
            SELECT CAST(SUM(a.n * b.n) AS BIGINT) AS c
            FROM cells a JOIN cells b ON b.qx > a.qx AND b.yb > a.yb
        ),
        disc AS (
            SELECT CAST(SUM(a.n * b.n) AS BIGINT) AS d
            FROM cells a JOIN cells b ON b.qx > a.qx AND b.yb < a.yb
        ),
        tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM cells),
        tx AS (
            SELECT CAST(SUM(nx * (nx - 1)) AS BIGINT) AS s FROM
            (SELECT SUM(n) AS nx FROM cells GROUP BY qx)
        ),
        ty AS (
            SELECT CAST(SUM(ny * (ny - 1)) AS BIGINT) AS s FROM
            (SELECT SUM(n) AS ny FROM cells GROUP BY yb)
        )
        SELECT nn AS n_rows, c AS concordant, d AS discordant,
               ROUND(2.0 * (c - d)
                     / (sqrt(CAST(CAST(nn AS DECIMAL(38,0)) * (nn - 1) - tx.s AS DOUBLE))
                        * sqrt(CAST(CAST(nn AS DECIMAL(38,0)) * (nn - 1) - ty.s AS DOUBLE))), 6)
                   AS kendall_tau_b
        FROM conc, disc, tot, tx, ty
    """,
    tags=("STATS-rank",),
)
def stats_kendall_tau_binned(spark, sf_dir):
    """Kendall's tau-b (quantity vs 5000-wide price band) computed from
    the CONTINGENCY GRID, not row pairs: concordant/discordant counts
    are a theta self-join over ~|50 x 21| cells whose n_a*n_b products
    count the underlying row pairs exactly.  The grid size is fixed by
    the value domains — at 100 TB the expensive O(cells^2) step still
    joins a few thousand broadcast rows while the data passes once
    through one hash aggregate.  Ties enter through the tau-b
    correction, kept x2 so everything stays integer until the final
    quotient (doubling both (n0-n1) factors cancels against 2(C-D)).
    The tau-b denominator forms nn*(nn-1) in DECIMAL(38,0) in BOTH
    engines — in int64 it overflows once n_rows exceeds ~3e9, well
    inside the 100 TB envelope (same hazard class as the
    stats_ratio_delta_ci co-moment caveat); the tie sums sx/sy and
    the C/D pair counts share the hazard only past ~3e9 rows in a
    single tie group, noted here as the next swap point."""
    l = load_table(spark, sf_dir, "lineitem")
    cells = (
        l.select(
            nan_to_null("l_quantity").cast("bigint").alias("qx"),
            F.floor(nan_to_null("l_extendedprice") / 5000).cast("bigint").alias("yb"),
        )
        .groupBy("qx", "yb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .persist()  # grid feeds five consumers; source scans once
    )
    a, b = cells.alias("a"), cells.alias("b")
    conc = (
        a.join(
            F.broadcast(b),
            (F.col("b.qx") > F.col("a.qx")) & (F.col("b.yb") > F.col("a.yb")),
        )
        .agg(F.sum(F.col("a.n") * F.col("b.n")).cast("bigint").alias("c"))
    )
    disc = (
        a.join(
            F.broadcast(b),
            (F.col("b.qx") > F.col("a.qx")) & (F.col("b.yb") < F.col("a.yb")),
        )
        .agg(F.sum(F.col("a.n") * F.col("b.n")).cast("bigint").alias("d"))
    )
    tot = cells.agg(F.sum("n").cast("bigint").alias("nn"))
    tx = (
        cells.groupBy("qx")
        .agg(F.sum("n").alias("nx"))
        .agg(F.sum(F.col("nx") * (F.col("nx") - 1)).cast("bigint").alias("sx"))
    )
    ty = (
        cells.groupBy("yb")
        .agg(F.sum("n").alias("ny"))
        .agg(F.sum(F.col("ny") * (F.col("ny") - 1)).cast("bigint").alias("sy"))
    )
    one = (
        conc.crossJoin(F.broadcast(disc))
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
    )
    nn_dec = F.col("nn").cast("decimal(38,0)")
    n0x2 = nn_dec * (nn_dec - 1)
    return one.select(
        F.col("nn").alias("n_rows"),
        F.col("c").alias("concordant"),
        F.col("d").alias("discordant"),
        # try_divide (round-12 degenerate sweep): all-tied margins zero
        # the tau-b denominator — defined NULL on both engines
        F.round(
            F.try_divide(
                F.lit(2.0) * (F.col("c") - F.col("d")),
                F.sqrt((n0x2 - F.col("sx")).cast("double"))
                * F.sqrt((n0x2 - F.col("sy")).cast("double")),
            ),
            6,
        ).alias("kendall_tau_b"),
    )


#: the five fixed priority classes — pivoting groups to COLUMNS makes
#: every cross-group float addition one fixed left-assoc expression,
#: identical in both engines (no aggregate-order nondeterminism and no
#: round-then-decimal, which loses meaning at the 1e13 magnitudes of
#: sums of squares).
_PRIORITIES = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")


def _anova_oracle() -> str:
    conds = [
        (
            f"CAST(SUM(CASE WHEN o_orderpriority = '{p}' THEN 1 ELSE 0 END) AS BIGINT) AS n{i}",
            f"CAST(CAST(SUM(CASE WHEN o_orderpriority = '{p}' "
            f"THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE 0 END) AS VARCHAR) AS DOUBLE) AS s{i}",
        )
        for i, p in enumerate(_PRIORITIES)
    ]
    cols = ",\n                   ".join(c for pair in conds for c in pair)
    q = " + ".join(f"s{i} * s{i} / n{i}" for i in range(len(_PRIORITIES)))
    s_tot = " + ".join(f"s{i}" for i in range(len(_PRIORITIES)))
    return f"""
        WITH g AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS nt,
                   CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))
                            * CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sxx,
                   {cols}
            FROM orders
        )
        SELECT 5 AS n_groups, nt AS n_rows,
               ({q}) - ({s_tot}) * ({s_tot}) / nt AS ss_between,
               sxx - ({q}) AS ss_within,
               ROUND(((({q}) - ({s_tot}) * ({s_tot}) / nt) / 4)
                     / ((sxx - ({q})) / (nt - 5)), 6) AS f_stat
        FROM g
    """


@register("stats_anova_oneway", oracle=_anova_oracle(), tags=("STATS-anova",))
def stats_anova_oneway(spark, sf_dir):
    """One-way ANOVA F statistic of order totals across the five
    priority classes.  The group dimension is a FIXED five-value domain,
    so groups pivot to columns in a single conditional aggregate: the
    per-class (n, Σx) and the global Σx² are exact decimal/integer
    sums, and everything after — Q = Σ S_i²/n_i, SSB = Q - S²/N,
    SSW = ΣX² - Q, F = (SSB/(k-1))/(SSW/(N-k)) — is one fixed
    left-associated float expression written identically in both
    engines (no aggregation over floats anywhere).  One pass, one
    1-row result; adding classes adds accumulators, not passes."""
    o = load_table(spark, sf_dir, "orders")
    x = F.col("o_totalprice").cast("decimal(18,2)")
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("nt"),
        # decimal->double via the decimal STRING: both engines' native
        # decimal->double conversions drift by ulps at some magnitudes
        # (extremetext 40-row corpus: DuckDB 3 ulp low), while decimal
        # toString + strtod is correctly rounded everywhere
        F.sum(x * x).cast("string").cast("double").alias("sxx"),
    ]
    for i, p in enumerate(_PRIORITIES):
        hit = F.col("o_orderpriority") == p
        aggs.append(F.sum(F.when(hit, 1).otherwise(0)).cast("bigint").alias(f"n{i}"))
        aggs.append(
            F.sum(F.when(hit, x).otherwise(F.lit(0).cast("decimal(18,2)")))
            .cast("string")
            .cast("double")
            .alias(f"s{i}")
        )
    g = o.agg(*aggs)
    # try_divide (round-12 degenerate sweep): an absent class zeroes an
    # n_i and nt ≤ 5 zeroes the within-d.o.f. — matching DuckDB, whose
    # x/0 NULL poisons Q and every statistic downstream identically
    q = None
    s_tot = None
    for i in range(len(_PRIORITIES)):
        term = F.try_divide(F.col(f"s{i}") * F.col(f"s{i}"), F.col(f"n{i}"))
        q = term if q is None else q + term
        s_tot = F.col(f"s{i}") if s_tot is None else s_tot + F.col(f"s{i}")
    ssb = q - s_tot * s_tot / F.col("nt")
    ssw = F.col("sxx") - q
    return g.select(
        F.lit(5).alias("n_groups"),
        F.col("nt").alias("n_rows"),
        ssb.alias("ss_between"),
        ssw.alias("ss_within"),
        F.round(
            F.try_divide(ssb / F.lit(4), F.try_divide(ssw, F.col("nt") - 5)), 6
        ).alias("f_stat"),
    )


def _levene_oracle() -> str:
    conds = [
        (
            f"CAST(SUM(CASE WHEN grp = '{p}' THEN 1 ELSE 0 END) AS BIGINT) AS n{i}",
            f"CAST(SUM(CASE WHEN grp = '{p}' THEN z ELSE CAST(0 AS DECIMAL(18,6)) END)"
            f" AS DOUBLE) AS s{i}",
        )
        for i, p in enumerate(_PRIORITIES)
    ]
    cols = ",\n                   ".join(c for pair in conds for c in pair)
    q = " + ".join(f"s{i} * s{i} / n{i}" for i in range(len(_PRIORITIES)))
    s_tot = " + ".join(f"s{i}" for i in range(len(_PRIORITIES)))
    return f"""
        WITH med AS (
            -- NaN pin (r13): quantile_cont does NOT skip NaN (it
            -- interpolates it — probed), so guard the input like the
            -- Spark side's nan_to_null-pinned percentile
            SELECT o_orderpriority AS grp,
                   ROUND(quantile_cont(CASE WHEN isnan(o_totalprice) THEN NULL
                                            ELSE o_totalprice END, 0.5), 6) AS md
            FROM orders GROUP BY 1
        ),
        zf AS (
            SELECT o.o_orderpriority AS grp,
                   CAST(ROUND(ABS(o.o_totalprice - m.md), 6) AS DECIMAL(18,6)) AS z
            FROM orders o JOIN med m ON o.o_orderpriority = m.grp
        ),
        g AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS nt,
                   CAST(SUM(CAST(z AS DECIMAL(28,6)) * z) AS DOUBLE) AS szz,
                   {cols}
            FROM zf
        )
        SELECT 5 AS n_groups, nt AS n_rows,
               ROUND(((({q}) - ({s_tot}) * ({s_tot}) / nt) / 4)
                     / ((szz - ({q})) / (nt - 5)), 6) AS w_stat
        FROM g
    """


@register("stats_levene_brownforsythe", oracle=_levene_oracle(), tags=("STATS-anova",))
def stats_levene_brownforsythe(spark, sf_dir):
    """Brown-Forsythe variance-homogeneity test (Levene with median
    centers) for order totals across the five priority classes — the
    companion check run before trusting the ANOVA F.  Per-group
    medians use the D10 interpolated-percentile parity; the absolute
    deviations are ROUND(·,6) into DECIMAL(18,6) so every cross-row
    accumulation (Σz, Σz² via exact decimal products) is order-free;
    the W statistic then reuses the stats_anova_oneway
    pivot-to-columns discipline — one fixed left-assoc float
    expression, no float aggregation anywhere.  Two scans: the 5-row
    median frame broadcast back over the data."""
    o = load_table(spark, sf_dir, "orders")
    med = o.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        # nan_to_null (r13): Spark's percentile ranks NaN largest where
        # DuckDB's quantile_cont skips it — the agg_percentile pin
        F.round(F.percentile(nan_to_null("o_totalprice"), F.lit(0.5)), 6).alias("md")
    )
    zf = o.join(F.broadcast(med), o.o_orderpriority == med.grp).select(
        "grp",
        # a NaN deviation routes to NULL through the decimal cast on
        # both engines (Spark silently, the oracle via the r13 pin) —
        # SUM skips it identically
        F.round(F.abs(nan_to_null(F.col("o_totalprice")) - F.col("md")), 6)
        .cast("decimal(18,6)")
        .alias("z"),
    )
    zdec = F.col("z").cast("decimal(18,6)")
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("nt"),
        F.sum(zdec * F.col("z")).cast("double").alias("szz"),
    ]
    for i, p in enumerate(_PRIORITIES):
        hit = F.col("grp") == p
        aggs.append(F.sum(F.when(hit, 1).otherwise(0)).cast("bigint").alias(f"n{i}"))
        aggs.append(
            F.sum(F.when(hit, F.col("z")).otherwise(F.lit(0).cast("decimal(18,6)")))
            .cast("double")
            .alias(f"s{i}")
        )
    g = zf.agg(*aggs)
    # try_divide: same degenerate-shape guard as stats_anova_oneway
    q = None
    s_tot = None
    for i in range(len(_PRIORITIES)):
        term = F.try_divide(F.col(f"s{i}") * F.col(f"s{i}"), F.col(f"n{i}"))
        q = term if q is None else q + term
        s_tot = F.col(f"s{i}") if s_tot is None else s_tot + F.col(f"s{i}")
    ssb = q - s_tot * s_tot / F.col("nt")
    ssw = F.col("szz") - q
    return g.select(
        F.lit(5).alias("n_groups"),
        F.col("nt").alias("n_rows"),
        F.round(
            F.try_divide(ssb / F.lit(4), F.try_divide(ssw, F.col("nt") - 5)), 6
        ).alias("w_stat"),
    )


@register(
    "agg_weighted_percentile_exact",
    oracle="""
        WITH per AS (
            SELECT l_extendedprice AS v,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
            FROM lineitem GROUP BY 1
        ),
        cum AS (
            SELECT v, w, SUM(w) OVER (ORDER BY v) AS cw,
                   SUM(w) OVER () AS tw
            FROM per
        )
        SELECT
            CAST(MIN(tw) AS BIGINT) AS total_weight,
            MIN(CASE WHEN 2 * cw >= tw THEN v END) AS p50_weighted,
            MIN(CASE WHEN 10 * cw >= 9 * tw THEN v END) AS p90_weighted,
            MIN(CASE WHEN 100 * cw >= 99 * tw THEN v END) AS p99_weighted
        FROM cum
    """,
    tags=("STATS-weighted",),
)
def agg_weighted_percentile_exact(spark, sf_dir):
    """Exact WEIGHTED percentiles (price weighted by quantity — the
    survey-weighting / volume-weighted quantile): the smallest value
    whose cumulative weight reaches p of the total, decided by exact
    integer cross-multiplication (2·cw >= tw etc), never a float
    fraction.  Cumulative weights run over the per-DISTINCT-value
    frame through banded prefix sums — zero unpartitioned Windows in
    the Spark plan while the oracle states the same semantics with a
    plain running sum."""
    l = load_table(spark, sf_dir, "lineitem")
    per = (
        l.groupBy(F.col("l_extendedprice").alias("v"))
        .agg(F.sum(nan_to_null("l_quantity").cast("bigint")).cast("bigint").alias("w"))
        .persist()
    )
    r = banded_running(per, value_col="v", tiebreak_col="v", sum_col="w")
    tot = per.agg(F.sum("w").cast("bigint").alias("tw"))
    cum = r.crossJoin(F.broadcast(tot))
    return cum.agg(
        F.min("tw").cast("bigint").alias("total_weight"),
        F.min(F.when(2 * F.col("run_sum") >= F.col("tw"), F.col("v"))).alias(
            "p50_weighted"
        ),
        F.min(F.when(10 * F.col("run_sum") >= 9 * F.col("tw"), F.col("v"))).alias(
            "p90_weighted"
        ),
        F.min(F.when(100 * F.col("run_sum") >= 99 * F.col("tw"), F.col("v"))).alias(
            "p99_weighted"
        ),
    )


@register(
    "stats_ratio_delta_ci",
    oracle="""
        WITH per_user AS (
            SELECT event_type, user_id,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS xc,
                   CAST(COUNT(*) AS BIGINT) AS y
            FROM events GROUP BY 1, 2
        ),
        m AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(xc) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(xc * xc) AS BIGINT) AS sxx,
                   CAST(SUM(y * y) AS BIGINT) AS syy,
                   CAST(SUM(xc * y) AS BIGINT) AS sxy
            FROM per_user GROUP BY 1
        )
        SELECT event_type, n AS n_users,
               ROUND(CAST(sx AS DOUBLE) / sy / 100, 6) AS ratio,
               ROUND(sqrt(
                   ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)
                    - 2 * (CAST(sx AS DOUBLE) / sy)
                        * (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
                    + (CAST(sx AS DOUBLE) / sy) * (CAST(sx AS DOUBLE) / sy)
                        * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n))
                   / (n - 1) / n) / (CAST(sy AS DOUBLE) / n) / 100, 6)
                   AS se_ratio
        FROM m
    """,
    tags=("STATS-ab",),
)
def stats_ratio_delta_ci(spark, sf_dir):
    """Delta-method standard error for RATIO metrics (value per event,
    clustered by user — the randomization unit): the A/B statistic
    naive per-row variance gets wrong and the delta method fixes:
    se(R) = sqrt((S_xx − 2R·S_xy + R²·S_yy)/((n−1)·n))/Ȳ with R =
    Σx/Σy.  All five co-moments accumulate as EXACT BIGINT (per-user
    value in integer cents: products stay under 2^63 through sf0.1 —
    beyond that the DECIMAL(38,0) swap applies, with the final
    statistics ROUND(·,6)-ed exactly as here, since int64→double
    conversion is correctly rounded where wide-decimal→double is not;
    policy.py round-8 caveat).  One hash aggregate per level: user
    rollup, then the 5-row moment reduction."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("event_type", "user_id").agg(
        F.sum(nan_to_null(F.round(F.col("value") * 100)).cast("bigint")).cast("bigint").alias("xc"),
        F.count(F.lit(1)).cast("bigint").alias("y"),
    )
    m = per_user.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("xc").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("xc") * F.col("xc")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("xc") * F.col("y")).cast("bigint").alias("sxy"),
    )
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    sxxd = F.col("sxx").cast("double")
    syyd = F.col("syy").cast("double")
    sxyd = F.col("sxy").cast("double")
    nd = F.col("n").cast("double")
    r = sxd / F.col("sy")
    core = (
        (sxxd - sxd * F.col("sx") / F.col("n"))
        - 2 * r * (sxyd - sxd * F.col("sy") / F.col("n"))
        + r * r * (syyd - syd * F.col("sy") / F.col("n"))
    )
    # try_divide (round-12 degenerate sweep): a one-user arm zeroes the
    # n-1 denominator — the clustered SE is the defined NULL then
    se = F.sqrt(F.try_divide(core, F.col("n") - 1) / F.col("n")) / (syd / nd) / 100
    return m.select(
        "event_type",
        F.col("n").alias("n_users"),
        F.round(sxd / F.col("sy") / 100, 6).alias("ratio"),
        F.round(se, 6).alias("se_ratio"),
    )


@register(
    "stats_qq_deciles",
    oracle="""
        WITH g AS (
            SELECT o_orderpriority,
                   CASE WHEN isnan(o_totalprice) THEN NULL
                        ELSE o_totalprice END AS o_totalprice
            FROM orders
            WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
        ),
        qa AS (
            SELECT quantile_cont(o_totalprice,
                       [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS ql
            FROM g WHERE o_orderpriority = '1-URGENT'
        ),
        qb AS (
            SELECT quantile_cont(o_totalprice,
                       [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS ql
            FROM g WHERE o_orderpriority = '5-LOW'
        ),
        q AS (
            SELECT d.d,
                   ROUND(qa.ql[d.d], 6) AS q_urgent,
                   ROUND(qb.ql[d.d], 6) AS q_low
            FROM (SELECT unnest(generate_series(1, 9)) AS d) d,
                 qa, qb
        )
        SELECT CAST(d AS BIGINT) AS decile, q_urgent, q_low,
               ROUND(q_urgent - q_low, 6) AS qq_diff
        FROM q
        ORDER BY d
    """,
    tags=("STATS-qq",),
)
def stats_qq_deciles(spark, sf_dir):
    """Quantile–quantile table at the nine deciles for o_totalprice,
    URGENT vs LOW priority — the distribution-shape comparison a KS
    statistic summarizes into one number, laid out as the QQ pairs an
    analyst actually plots (a straight q_urgent ≈ q_low line means
    the arms match; a fanning diff means tail divergence).

    Exactness: both engines compute type-7 linearly interpolated
    quantiles (Spark `percentile` ↔ DuckDB `quantile_cont` — the
    agg_percentile-verified parity), rounded once at 6 dp; the decile
    grid is a literal 1..9 frame so the whole result is 9 rows.

    100 TB posture: ONE aggregate per arm computes all nine deciles
    in a single pass (percentile takes the array of fractions —
    no nine-sort blowup), then a 9-row unpivot/join; the exact
    order-statistic sort per arm is the same cost class as D10."""
    o = load_table(spark, sf_dir, "orders")
    fracs = [i / 10.0 for i in range(1, 10)]
    agg = (
        o.where(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .groupBy("o_orderpriority")
        .agg(
            *[
                F.round(
                    F.percentile(nan_to_null("o_totalprice"), F.lit(f)), 6
                ).alias(f"q{i}")
                for i, f in enumerate(fracs, start=1)
            ]
        )
    )
    # unpivot the two 9-quantile rows into the 9-row QQ frame
    stacked = agg.select(
        "o_orderpriority",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("bigint").alias("decile"),
                        F.col(f"q{i}").alias("q"),
                    )
                    for i in range(1, 10)
                ]
            )
        ).alias("s"),
    ).select("o_orderpriority", "s.decile", "s.q")
    u = stacked.where(F.col("o_orderpriority") == "1-URGENT").select(
        "decile", F.col("q").alias("q_urgent")
    )
    lo = stacked.where(F.col("o_orderpriority") == "5-LOW").select(
        "decile", F.col("q").alias("q_low")
    )
    # literal 1..9 decile grid with LEFT joins (round-12 degenerate
    # sweep): the oracle's decile frame is generate_series, so the QQ
    # table keeps its nine rows (all-NULL quantiles) even when an arm
    # — or the whole corpus — is empty; inner joins vanished instead.
    grid = (
        stacked.sparkSession.range(1, 10).select(F.col("id").cast("bigint").alias("decile"))
    )
    return (
        grid.join(u, "decile", "left")
        .join(lo, "decile", "left")
        .select(
            "decile",
            "q_urgent",
            "q_low",
            F.round(F.col("q_urgent") - F.col("q_low"), 6).alias("qq_diff"),
        )
        .orderBy("decile")
    )


#: Wasserstein bin width in dollars — fixed engine-independent edges,
#: same monitor-never-drifts rationale as dq_distribution_drift.
W1_BIN = 10_000


@register(
    "stats_wasserstein_binned",
    oracle=f"""
        WITH g AS (
            SELECT o_orderpriority AS arm,
                   CAST(FLOOR(o_totalprice / {W1_BIN}) AS BIGINT) AS bin
            FROM orders
            -- complete-case: NULL prices are not observations (r12;
            -- NaN added r13 — NaN passes IS NOT NULL and would bin)
            WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
              AND o_totalprice IS NOT NULL AND NOT isnan(o_totalprice)
        ),
        h AS (
            SELECT bin,
                   CAST(SUM(CASE WHEN arm = '1-URGENT' THEN 1 ELSE 0 END)
                        AS BIGINT) AS na,
                   CAST(SUM(CASE WHEN arm = '5-LOW' THEN 1 ELSE 0 END)
                        AS BIGINT) AS nb
            FROM g GROUP BY bin
        ),
        t AS (
            SELECT CAST(SUM(na) AS BIGINT) AS ta,
                   CAST(SUM(nb) AS BIGINT) AS tb FROM h
        ),
        c AS (
            SELECT bin,
                   SUM(na) OVER (ORDER BY bin) AS ca,
                   SUM(nb) OVER (ORDER BY bin) AS cb
            FROM h
        ),
        terms AS (
            SELECT CAST(ROUND(abs(CAST(ca AS DOUBLE) / ta
                                  - CAST(cb AS DOUBLE) / tb), 9)
                        AS DECIMAL(28,9)) AS term
            FROM c CROSS JOIN t
        )
        SELECT (SELECT ta FROM t) AS n_urgent,
               (SELECT tb FROM t) AS n_low,
               CAST((SELECT COUNT(*) FROM h) AS BIGINT) AS n_bins,
               ROUND(CAST(SUM(term) AS DOUBLE) * {W1_BIN}, 6) AS w1_dollars
        FROM terms
    """,
    tags=("STATS-wasserstein",),
)
def stats_wasserstein_binned(spark, sf_dir):
    """Earth-mover (1-Wasserstein) distance between the URGENT and
    LOW o_totalprice distributions on a fixed $10,000-wide grid —
    the drift metric that, unlike KS (max CDF gap) or PSI (density
    ratio), weighs HOW FAR probability mass moved, in dollars:
    W₁ = binwidth · Σ_bins |CDF_a − CDF_b| for binned distributions.

    Exactness: both histograms come from ONE conditional aggregate on
    exact integer bins; cumulative counts are exact BIGINT running
    sums over the bounded bin frame (≤ ~60 occupied bins — the
    win_unpartitioned_caution bounded-slice exemption); each |CDF
    gap| is one float expression rounded to 9 dp into DECIMAL so the
    final sum is order-free.

    100 TB posture: the full scan reduces map-side to |bins| rows;
    everything after is arithmetic on a broadcast-sized frame.  The
    fixed grid (never data-dependent quantiles) keeps the monitor
    comparable across runs — the dq_distribution_drift design rule."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
        # complete-case (r12; NaN added r13 — NaN passes isNotNull)
        & F.col("o_totalprice").isNotNull()
        & ~F.isnan("o_totalprice")
    )
    h = (
        o.groupBy(
            F.floor(F.col("o_totalprice") / W1_BIN).cast("bigint").alias("bin")
        )
        .agg(
            F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0))
            .cast("bigint")
            .alias("na"),
            F.sum(F.when(F.col("o_orderpriority") == "5-LOW", 1).otherwise(0))
            .cast("bigint")
            .alias("nb"),
        )
    )
    t = h.agg(
        F.sum("na").cast("bigint").alias("ta"),
        F.sum("nb").cast("bigint").alias("tb"),
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
    )
    wc = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    c = h.select(
        "bin",
        F.sum("na").over(wc).alias("ca"),
        F.sum("nb").over(wc).alias("cb"),
    )
    # NULLIF-guarded CDF denominators + a GLOBAL term sum crossed back
    # onto the always-one-row totals frame (round-12 degenerate sweep):
    # grouping the sum by (ta, tb, n_bins) emitted zero rows on an
    # empty corpus, and an absent arm made ca/ta a 0-divisor — both
    # engines now yield the defined one-row NULL summary instead.
    terms = c.crossJoin(F.broadcast(t)).select(
        F.round(
            F.abs(
                F.col("ca").cast("double") / F.nullif(F.col("ta"), F.lit(0))
                - F.col("cb").cast("double") / F.nullif(F.col("tb"), F.lit(0))
            ),
            9,
        )
        .cast("decimal(28,9)")
        .alias("term"),
    )
    sum_terms = terms.agg(
        F.round(F.sum("term").cast("double") * W1_BIN, 6).alias("w1_dollars")
    )
    return t.crossJoin(F.broadcast(sum_terms)).select(
        F.col("ta").alias("n_urgent"),
        F.col("tb").alias("n_low"),
        "n_bins",
        "w1_dollars",
    )


@register(
    "stats_tukey_hsd_grid",
    oracle="""
        WITH g AS (
            SELECT o_orderpriority AS arm,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s
            FROM orders GROUP BY 1
        ),
        tot AS (
            SELECT CAST(SUM(n) AS BIGINT) AS nt,
                   CAST(SUM(CAST(s * s AS DOUBLE) / n) AS DOUBLE) AS q,
                   (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))
                                 * CAST(o_totalprice AS DECIMAL(18,2)))
                            AS DOUBLE) FROM orders) AS sxx
            FROM g
        ),
        mse AS (
            SELECT (sxx - q) / (nt - (SELECT COUNT(*) FROM g)) AS mse FROM tot
        )
        SELECT a.arm AS arm_a, b.arm AS arm_b, a.n AS n_a, b.n AS n_b,
               ROUND(a.s / a.n, 6) AS mean_a,
               ROUND(b.s / b.n, 6) AS mean_b,
               ROUND(a.s / a.n - b.s / b.n, 6) AS mean_diff,
               ROUND(abs(a.s / a.n - b.s / b.n)
                     / sqrt(mse.mse / 2 * (1.0 / a.n + 1.0 / b.n)), 6)
                   AS q_stat
        FROM g a JOIN g b ON a.arm < b.arm CROSS JOIN mse
        ORDER BY arm_a, arm_b
    """,
    tags=("STATS-anova",),
)
def stats_tukey_hsd_grid(spark, sf_dir):
    """Tukey honestly-significant-difference grid: the studentized
    range statistic q = |x̄ᵢ − x̄ⱼ| / √(MSE/2·(1/nᵢ+1/nⱼ)) for all ten
    priority-arm pairs — the post-hoc step that tells you WHICH arms
    differ after stats_anova_oneway's F says SOMETHING does (the
    Tukey–Kramer form handles the unequal nᵢ).  Compare q against the
    studentized-range critical value q(α, k, N−k) ≈ 3.86 at α=.05,
    k=5, N→∞.

    Exactness: per-arm (n, Σx) and the global Σx² reuse the ANOVA
    exact-moment discipline (DECIMAL sums, floats only in final
    expressions); MSE = (Σx² − ΣSᵢ²/nᵢ)/(N−k) is one fixed float
    expression and every pair statistic is another, rounded once.

    100 TB posture: ONE data pass (the 5-arm aggregate + the global
    Σx² ride the same scan in the Spark plan via two aggregates over
    a shared cached projection); the pair grid is a self-join of the
    5-row frame.  More arms grow the grid quadratically but the scan
    count stays constant."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("arm"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("x"),
    ).persist()
    g = o.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("double").alias("s"),
    ).persist()
    sxx = o.agg(F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"))
    tot = (
        g.agg(
            F.sum("n").cast("bigint").alias("nt"),
            F.sum(F.col("s") * F.col("s") / F.col("n")).cast("double").alias("q"),
            F.count(F.lit(1)).cast("bigint").alias("k"),
        )
        .crossJoin(F.broadcast(sxx))
        # try_divide (round-12 degenerate sweep): a one-arm or
        # one-row-per-arm corpus zeroes N−k — MSE is the defined NULL
        .select(
            F.try_divide(F.col("sxx") - F.col("q"), F.col("nt") - F.col("k")).alias(
                "mse"
            )
        )
    )
    a, b = g.alias("a"), g.alias("b")
    ma = F.col("a.s") / F.col("a.n")
    mb = F.col("b.s") / F.col("b.n")
    return (
        a.join(b, F.col("a.arm") < F.col("b.arm"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("a.arm").alias("arm_a"),
            F.col("b.arm").alias("arm_b"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
            F.round(ma, 6).alias("mean_a"),
            F.round(mb, 6).alias("mean_b"),
            F.round(ma - mb, 6).alias("mean_diff"),
            F.round(
                F.try_divide(
                    F.abs(ma - mb),
                    F.sqrt(
                        F.col("mse") / 2 * (1.0 / F.col("a.n") + 1.0 / F.col("b.n"))
                    ),
                ),
                6,
            ).alias("q_stat"),
        )
        .orderBy("arm_a", "arm_b")
    )


#: ξ band width in cents — contiguous x-ranges so band seams are
#: adjacent rows in the global x-order (the sort-key seam trick)
XI_BAND_CENTS = 500_000


@register(
    "stats_xi_correlation",
    oracle="""
        WITH rows_ AS (
            SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS x,
                   CAST(l_quantity AS BIGINT) AS y,
                   l_orderkey, l_linenumber
            FROM lineitem
            -- complete-case: NULL measures are not observations (r12;
            -- NaN added r13 — an IEEE-NaN measure is equally undefined)
            WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
              AND NOT isnan(l_extendedprice) AND NOT isnan(l_quantity)
        ),
        ymap AS (
            SELECT y AS yv,
                   CAST(SUM(COUNT(*)) OVER (ORDER BY y) AS BIGINT) AS c_le,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM rows_ GROUP BY y
        ),
        n_ AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM rows_),
        ranked AS (
            SELECT r.x, m.c_le AS r_i,
                   n_.n - (m.c_le - m.cnt) AS l_i,
                   LAG(m.c_le) OVER (ORDER BY r.x, r.l_orderkey,
                                     r.l_linenumber) AS r_prev
            FROM rows_ r JOIN ymap m ON m.yv = r.y CROSS JOIN n_
        ),
        num AS (
            SELECT CAST(SUM(ABS(r_i - r_prev)) AS BIGINT) AS s_num
            FROM ranked WHERE r_prev IS NOT NULL
        ),
        den AS (
            SELECT CAST(SUM(CAST(cnt AS DECIMAL(38,0))
                            * (n_.n - (c_le - cnt))
                            * (n_.n - (n_.n - (c_le - cnt)))) AS DOUBLE) AS s_den
            FROM ymap CROSS JOIN n_
        )
        SELECT n_.n AS n_rows, num.s_num,
               ROUND(1.0 - CAST(n_.n AS DOUBLE) * num.s_num / (2.0 * den.s_den), 6)
                   AS xi
        FROM n_ CROSS JOIN num CROSS JOIN den
    """,
    tags=("STATS-rank",),
)
def stats_xi_correlation(spark, sf_dir):
    """Chatterjee's ξ coefficient (JASA 2021) — the modern dependence
    measure that detects ANY functional relationship y = f(x), not
    just monotone ones (Spearman/Kendall read oscillating dependence
    as zero): sort by x, walk the y-ranks, and score how much they
    jump — ξ = 1 − n·Σ|r_{i+1} − r_i| / (2·Σ lᵢ(n−lᵢ)), the
    tie-aware form (y = quantity is massively tied).  Here: how
    strongly does extended price DETERMINE quantity.

    The distributed trick is the numerator's consecutive-pair walk in
    global x-order WITHOUT a global window: contiguous price bands
    (FLOOR(cents/5e5)) make band seams adjacent rows, so Σ|Δr| =
    within-band lag sums (partitioned windows) + |Δr| across each
    band seam, reconciled on the |bands|-row head/tail frame — the
    etl_sort_key_run_counts seam machinery applied to a statistic.
    The oracle uses the naive single-window form; the banded Spark
    sum must (and does) equal it exactly — integer ranks, no floats
    until the final ξ expression.

    Exactness: ranks rᵢ = #{y_j ≤ yᵢ} and lᵢ come from the 50-row y
    cumulative map (exact BIGINT, broadcast); the numerator is an
    exact integer; the denominator Σ cnt·l·(n−l) accumulates in
    DECIMAL(38,0) (~n³ magnitude); ξ is one float expression rounded
    once.

    100 TB posture: one scan; the within-band windows partition on
    the band key (each band a contiguous x-range — range-partition-
    friendly); the seam frame is |bands| rows.  Band width trades
    partition size against seam count exactly like the sort-key
    planner's bands."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").where(
        # complete-case: NULL measures are not observations (r12; NaN
        # added r13 — NaN passes isNotNull on both engines)
        F.col("l_extendedprice").isNotNull()
        & F.col("l_quantity").isNotNull()
        & ~F.isnan("l_extendedprice")
        & ~F.isnan("l_quantity")
    )
    rows = li.select(
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("x"),
        nan_to_null("l_quantity").cast("bigint").alias("y"),
        "l_orderkey",
        "l_linenumber",
    )
    ymap = (
        rows.groupBy(F.col("y").alias("yv"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .select(
            "yv",
            "cnt",
            F.sum("cnt")
            .over(
                Window.orderBy("yv").rowsBetween(Window.unboundedPreceding, 0)
            )
            .cast("bigint")
            .alias("c_le"),
        )
    )
    n_df = rows.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ranked = (
        rows.join(F.broadcast(ymap), rows["y"] == ymap["yv"])
        .select(
            "x",
            "l_orderkey",
            "l_linenumber",
            F.col("c_le").alias("r_i"),
            F.floor(F.col("x") / XI_BAND_CENTS).cast("bigint").alias("band"),
        )
        .persist()
    )
    wb = Window.partitionBy("band").orderBy("x", "l_orderkey", "l_linenumber")
    tagged = ranked.select(
        "band",
        "r_i",
        F.lag("r_i").over(wb).alias("r_prev"),
        F.row_number().over(wb).alias("rn_a"),
        F.row_number()
        .over(
            Window.partitionBy("band").orderBy(
                F.col("x").desc(), F.col("l_orderkey").desc(), F.col("l_linenumber").desc()
            )
        )
        .alias("rn_d"),
    ).persist()
    within = tagged.agg(
        F.sum(F.when(F.col("r_prev").isNotNull(), F.abs(F.col("r_i") - F.col("r_prev"))))
        .cast("bigint")
        .alias("s_within")
    )
    heads = tagged.where(F.col("rn_a") == 1).select("band", F.col("r_i").alias("h_r"))
    tails = tagged.where(F.col("rn_d") == 1).select(
        F.col("band").alias("tband"), F.col("r_i").alias("t_r")
    )
    wseam = Window.orderBy("band")
    seams = (
        heads.join(tails, heads["band"] == tails["tband"])
        .select("band", "h_r", "t_r")
        .select("band", "h_r", F.lag("t_r").over(wseam).alias("prev_t"))
        .agg(
            F.sum(F.when(F.col("prev_t").isNotNull(), F.abs(F.col("h_r") - F.col("prev_t"))))
            .cast("bigint")
            .alias("s_seam")
        )
    )
    den = ymap.crossJoin(F.broadcast(n_df)).agg(
        F.sum(
            F.col("cnt").cast("decimal(38,0)")
            * (F.col("n") - (F.col("c_le") - F.col("cnt")))
            * (F.col("n") - (F.col("n") - (F.col("c_le") - F.col("cnt"))))
        )
        .cast("double")
        .alias("s_den")
    )
    # one-band corpora have ZERO seam pairs (s_seam NULL) while the
    # oracle sums within+seam as ONE walk — s_num is NULL only when no
    # consecutive pair exists at all (n ≤ 1), else missing halves are
    # 0-contribution (round-12 degenerate sweep)
    s_num = F.when(
        F.col("s_within").isNull() & F.col("s_seam").isNull(),
        F.lit(None).cast("bigint"),
    ).otherwise(
        F.coalesce(F.col("s_within"), F.lit(0)) + F.coalesce(F.col("s_seam"), F.lit(0))
    )
    return (
        within.crossJoin(F.broadcast(seams))
        .crossJoin(F.broadcast(n_df))
        .crossJoin(F.broadcast(den))
        .select(
            F.col("n").alias("n_rows"),
            s_num.cast("bigint").alias("s_num"),
            # try_divide (round-12 degenerate sweep): all-equal y makes
            # Σ lᵢ(n−lᵢ) zero — ξ is the defined NULL on both engines
            F.round(
                F.lit(1.0)
                - F.try_divide(
                    F.col("n").cast("double") * s_num,
                    2.0 * F.col("s_den"),
                ),
                6,
            ).alias("xi"),
        )
    )
