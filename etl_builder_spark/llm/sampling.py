"""Sampling operators for training-data curation: seeded uniform
sampling, stratified per-language sampling, and deterministic
hash-based sampling.

Hash-based sampling is the 100 TB default: membership depends only on
the row key (stable across reruns, engines, partitionings — the same
documents are sampled no matter how the data is laid out), it needs no
sampling state, and it composes with incremental pipelines (a new file
arriving later samples consistently). Seeded rand()-based sampling is
partitioning-dependent by construction → rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from etl_builder_spark.folding import nan_to_null

from etl_builder_spark.registry import register
from etl_builder_spark.session import load_table


def hash_sample(df: DataFrame, key: str, fraction: float, mod: int = 10_000) -> DataFrame:
    """Deterministic sample: keep rows where a stable hash of the key
    falls under fraction·mod. Engine-portable when the hash is portable
    — here the polynomial char hash shared with doc_fingerprint."""
    return df.where(F.pmod(F.xxhash64(F.col(key)), F.lit(mod)) < int(fraction * mod))


@register(
    "sample_hash_deterministic",
    oracle="""
        SELECT doc_id, lang, n_chars
        FROM documents
        WHERE (CAST(doc_id * 2654435761 AS BIGINT) % 4294967296) % 10000 < 2000
    """,
    tags=("I-sample",),
)
def sample_hash_deterministic(spark, sf_dir):
    """20% deterministic sample via Knuth multiplicative hashing on the
    key — identical membership in any engine, any partitioning. (The
    mixer is (k·2654435761 mod 2^32) mod 10000 — exact 64-bit integer
    math on both sides.)"""
    d = load_table(spark, sf_dir, "documents")
    bucket = F.pmod(
        F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(4294967296)), F.lit(10000)
    )
    return d.where(bucket < 2000).select("doc_id", "lang", "n_chars")


@register(
    "sample_stratified_seeded",
    oracle=None,  # rand()-based membership is engine/partitioning-specific
    tags=("I-sample",),
)
def sample_stratified_seeded(spark, sf_dir):
    """Stratified per-language sampling (sampleBy, fixed seed) —
    balances language mix in a curated corpus. Seeded but
    partitioning-dependent → rows-only."""
    d = load_table(spark, sf_dir, "documents")
    fractions = {"en": 0.3, "de": 0.6, "es": 0.6, "fr": 0.6, "zh": 0.6}
    sampled = d.sampleBy("lang", fractions, seed=42)
    return sampled.groupBy("lang").agg(F.count(F.lit(1)).alias("n_sampled"))


@register(
    "sample_train_test_split",
    oracle="""
        SELECT doc_id, lang, n_chars,
               CASE WHEN bucket < 8000 THEN 'train'
                    WHEN bucket < 9000 THEN 'val'
                    ELSE 'test' END AS split
        FROM (
            SELECT doc_id, lang, n_chars,
                   (CAST(doc_id * 2654435761 AS BIGINT) % 4294967296) % 10000 AS bucket
            FROM documents
        )
    """,
    tags=("I-sample-split",),
)
def sample_train_test_split(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test assignment by KEY HASH —
    the split discipline for training corpora: membership is a pure
    function of doc_id (Knuth multiplicative mixer, exact 64-bit
    integer math in any engine), so (a) re-runs, engine swaps, and
    repartitioning never move a document across splits, (b)
    near-duplicate leakage checks can join split labels without a
    side-channel, and (c) the assignment is a MAP with zero shuffle —
    at 100 TB the split column costs one projection.  rand()-based
    splits fail all three (the documented reason
    ``sample_stratified_seeded`` is rows-only while this key is
    exact)."""
    d = load_table(spark, sf_dir, "documents")
    bucket = F.pmod(
        F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(4294967296)), F.lit(10000)
    )
    split = (
        F.when(bucket < 8000, F.lit("train"))
        .when(bucket < 9000, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return d.select("doc_id", "lang", "n_chars", split.alias("split"))


@register(
    "sample_weighted_hash",
    oracle="""
        SELECT doc_id, lang, n_chars,
               CAST(LEAST(10000, n_chars * 10000 // 400) AS BIGINT) AS keep_threshold
        FROM (
            SELECT doc_id, lang, n_chars,
                   (CAST(doc_id * 2654435761 AS BIGINT) % 4294967296) % 10000 AS bucket
            FROM documents
        )
        WHERE bucket < LEAST(10000, n_chars * 10000 // 400)
    """,
    tags=("I-sample-weighted",),
)
def sample_weighted_hash(spark, sf_dir):
    """Deterministic WEIGHTED sampling — keep probability proportional
    to document length (capped at 1.0 above 400 chars), the standard
    quality-weighted downsampling move when curating a training mix.
    Same Knuth multiplicative hash as sample_hash_deterministic for
    the uniform variate, compared against an integer per-row threshold
    (exact 64-bit math both sides) — membership is identical in any
    engine at any partitioning, and re-running the pipeline yields the
    same corpus (reproducible data lineage).  Pure expression filter:
    pushes down to the scan, no shuffle at all."""
    d = load_table(spark, sf_dir, "documents")
    bucket = F.pmod(
        F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(4294967296)), F.lit(10000)
    )
    threshold = F.least(
        F.lit(10000).cast("long"), (F.col("n_chars") * 10000 / 400).cast("long")
    )
    return d.where(bucket < threshold).select(
        "doc_id", "lang", "n_chars", threshold.alias("keep_threshold")
    )


@register(
    "pipeline_training_mix",
    oracle="""
        WITH avail AS (
            SELECT lang, COUNT(*) AS n_avail FROM documents GROUP BY lang
        ),
        target AS (
            -- balanced mix: every language aims for the SMALLEST
            -- language's size (downsample-only — never upsample)
            SELECT MIN(n_avail) AS n_target FROM avail
        ),
        rates AS (
            SELECT a.lang, a.n_avail, t.n_target,
                   CAST((t.n_target * 10000) // a.n_avail AS BIGINT) AS keep_bp
            FROM avail a CROSS JOIN target t
        ),
        sampled AS (
            SELECT d.lang, COUNT(*) AS n_sampled
            FROM documents d
            JOIN rates r ON r.lang = d.lang
            WHERE (CAST(d.doc_id * 2654435761 AS BIGINT) % 4294967296) % 10000
                  < r.keep_bp
            GROUP BY d.lang
        )
        SELECT r.lang, r.n_avail, r.n_target, r.keep_bp,
               COALESCE(s.n_sampled, 0) AS n_sampled
        FROM rates r LEFT JOIN sampled s ON s.lang = r.lang
    """,
    tags=("I-training-mix",),
)
def pipeline_training_mix(spark, sf_dir):
    """Training-mix construction end to end: measure availability per
    language, derive a balanced target (downsample every language to
    the smallest one — never upsample), convert to an integer
    basis-point keep-rate, and APPLY it with the deterministic Knuth
    bucket — the same reproducible-membership contract as
    sample_hash_deterministic, now with a per-GROUP data-derived rate
    (broadcast rate join, zero-shuffle filter).  The report row per
    language (available / target / rate / actually-sampled) is the
    mix audit a curation run logs; realized counts differ from target
    only by hash-bucket granularity, visibly.  At 100 TB the rate
    table is tiny forever and membership stays a pure function of
    (doc_id, rates) — re-runs and backfills sample identically."""
    d = load_table(spark, sf_dir, "documents")
    avail = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_avail"))
    target = avail.agg(F.min("n_avail").alias("n_target"))
    rates = avail.crossJoin(F.broadcast(target)).select(
        "lang",
        "n_avail",
        "n_target",
        ((F.col("n_target") * 10000) / F.col("n_avail")).cast("long").alias("keep_bp"),
    )
    bucket = F.pmod(
        F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(4294967296)), F.lit(10000)
    )
    sampled = (
        d.join(F.broadcast(rates.select("lang", "keep_bp")), "lang")
        .where(bucket < F.col("keep_bp"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )
    return rates.join(sampled, "lang", "left").select(
        "lang",
        "n_avail",
        "n_target",
        "keep_bp",
        F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
    )


@register(
    "sample_negative_pairs",
    oracle="""
        WITH n AS (SELECT COUNT(*) AS n_docs FROM documents),
        pairs AS (
            SELECT d.doc_id AS anchor_id,
                   (d.doc_id * 2654435761 + k * 40503) % n.n_docs AS neg_id,
                   CAST(k AS INT) AS k
            FROM documents d
            CROSS JOIN n
            CROSS JOIN unnest(range(0, 4)) AS t(k)
        )
        SELECT anchor_id, k, neg_id
        FROM pairs
        WHERE neg_id <> anchor_id
    """,
    tags=("I-negatives",),
)
def sample_negative_pairs(spark, sf_dir):
    """Deterministic negative sampling for contrastive training: each
    anchor document gets 4 pseudo-random negatives via multiplicative
    hashing over the id space (Knuth/LCG constants), self-pairs
    dropped — the (anchor, negative) pair table a contrastive or
    reranker trainer consumes.  Hash-based negatives are the
    production form: reproducible across runs and engines (the
    oracle replays the arithmetic exactly), no sampling pass, no
    state, and resampling epoch e is just adding e to the hash input.

    100 TB posture: ZERO shuffles — a ×k expression explode and a
    modular multiply per row; the id-space modulus comes from a
    broadcast 1-row count.  (By-id negatives assume a dense id space;
    with sparse keys, hash into a row-number index first — one extra
    zipWithIndex-style pass.)"""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    k = F.explode(F.sequence(F.lit(0), F.lit(3))).alias("k")
    pairs = d.crossJoin(F.broadcast(n)).select(
        F.col("doc_id").alias("anchor_id"), F.col("n_docs"), k
    )
    neg = (F.col("anchor_id") * F.lit(2654435761) + F.col("k") * F.lit(40503)) % F.col("n_docs")
    return (
        pairs.select("anchor_id", F.col("k").cast("int").alias("k"), neg.alias("neg_id"))
        .where(F.col("neg_id") != F.col("anchor_id"))
    )


@register(
    "sample_bottom_k_global",
    oracle="""
        SELECT doc_id, lang, n_chars, hkey FROM (
            SELECT doc_id, lang, n_chars,
                   md5(CAST(doc_id AS VARCHAR) || ':42') AS hkey
            FROM documents
        ) ORDER BY hkey LIMIT 100
    """,
    tags=("I-sample-bottomk",),
)
def sample_bottom_k_global(spark, sf_dir):
    """EXACT fixed-size uniform sample: the k rows with the smallest
    md5(key:seed) — the distributed answer to "give me exactly 100
    random docs, reproducibly".  Rate-based hash sampling
    (sample_hash_deterministic) can't promise a size; bottom-k can,
    with the same any-engine/any-partitioning determinism (md5 is
    byte-identical everywhere — fn_hash_codec), and changing the seed
    string re-deals the sample.

    100 TB posture: this is a global top-k on a computed key, so it
    plans as TakeOrderedAndProject (plan-asserted with topk_global) —
    each task keeps its local 100 smallest, the driver merges k·tasks
    rows, nothing global is ever sorted.  That is exactly the
    bottom-k reservoir trick streaming samplers use, expressed as one
    declarative query."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            "lang",
            "n_chars",
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":42"))).alias("hkey"),
        )
        .orderBy("hkey")
        .limit(100)
    )


@register(
    "sample_stratified_quota",
    oracle="""
        WITH h AS (
            SELECT doc_id, lang, n_chars,
                   md5(CAST(doc_id AS VARCHAR) || ':7') AS hkey
            FROM documents
        ),
        r AS (
            SELECT doc_id, lang, n_chars,
                   ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hkey, doc_id) AS rnk
            FROM h
        )
        SELECT doc_id, lang, n_chars, CAST(rnk AS INT) AS rnk
        FROM r WHERE rnk <= 100
    """,
    tags=("I-sample-quota",),
)
def sample_stratified_quota(spark, sf_dir):
    """EXACT-size stratified sampling: precisely 100 documents per
    language (fewer only if the stratum is smaller), chosen as the 100
    smallest md5(doc_id:seed) WITHIN each stratum — the quota-sampling
    companion to ``sample_stratified_seeded`` (whose sampleBy
    fractions are engine/partitioning-specific and give only expected
    counts, → rows-only) and the per-stratum form of
    ``sample_bottom_k_global``.  Same-seed reruns, any engine, any
    layout pick the SAME documents, and quotas are exact — what a
    balanced-language training mix actually needs.

    100 TB posture: rank ≤ k over Window.partitionBy(lang) plans as
    WindowGroupLimit (plan-asserted) — per-partition top-k pushdown
    BEFORE the shuffle, so each mapper forwards at most k rows per
    stratum instead of sort-shuffling whole strata; a skewed stratum
    (90% English) costs its mappers k rows each, never a global sort.
    The hash key means no sampling state and incremental consistency
    (new files re-rank, previously-chosen survivors stay stable as the
    pool grows only if their hash stays in the bottom k — quota
    sampling is inherently pool-dependent, unlike fraction sampling)."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    h = d.select(
        "doc_id",
        "lang",
        "n_chars",
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":7"))).alias("hkey"),
    )
    w = Window.partitionBy("lang").orderBy("hkey", "doc_id")
    return (
        h.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 100)
        .select("doc_id", "lang", "n_chars", F.col("rnk").cast("int").alias("rnk"))
    )


#: PPSWOR sample size and the uniform-hash granularity
PPSWOR_K = 200
PPSWOR_MOD = 10_000


@register(
    "sample_priority_ppswor",
    oracle=f"""
        WITH pri AS (
            SELECT o_orderkey,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS w_cents,
                   (o_orderkey * 2654435761) % 4294967296 % {PPSWOR_MOD} + 1 AS u
            FROM orders
        )
        SELECT o_orderkey, w_cents,
               ROUND(CAST(w_cents AS DOUBLE) / u, 6) AS priority
        FROM pri
        ORDER BY CAST(w_cents AS DOUBLE) / u DESC, o_orderkey
        LIMIT {PPSWOR_K}
    """,
    tags=("SAMPLE-ppswor",),
)
def sample_priority_ppswor(spark, sf_dir):
    """Priority (PPSWOR — probability proportional to size, without
    replacement) sampling: each order draws a pinned pseudo-uniform
    u from the Knuth mixer of its key and gets priority w/u; the
    global top-{PPSWOR_K} by priority IS a PPS sample (Ohlsson /
    Rosén sequential Poisson sampling, public literature) — the
    weighted-reservoir pattern for building value-representative
    subsets of a 100 TB fact table in one pass.  Deterministic: the
    mixer is exact integer arithmetic, both engines compute the SAME
    double division, and ties break on the key.

    100 TB posture: priorities are expression-side; the global top-k
    is TakeOrderedAndProject (per-partition heaps + a k-row driver
    merge — the topk_global plan), so nothing resembling a global
    sort or a collect touches the full table."""
    o = load_table(spark, sf_dir, "orders")
    w = nan_to_null(F.round(F.col("o_totalprice") * 100)).cast("bigint")
    u = F.pmod(F.pmod(F.col("o_orderkey") * 2654435761, F.lit(4294967296)), F.lit(PPSWOR_MOD)) + 1
    pri = o.select("o_orderkey", w.alias("w_cents"), u.alias("u")).select(
        "o_orderkey",
        "w_cents",
        (F.col("w_cents").cast("double") / F.col("u")).alias("p_raw"),
    )
    return (
        pri.orderBy(F.col("p_raw").desc(), "o_orderkey")
        .limit(PPSWOR_K)
        .select("o_orderkey", "w_cents", F.round(F.col("p_raw"), 6).alias("priority"))
    )


@register(
    "sample_balanced_downsample",
    oracle="""
        WITH base AS (
            SELECT l_orderkey, l_linenumber,
                   CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS pos,
                   list_reduce(list_transform(list_filter(string_split_regex(
                       substr(md5(CAST(l_orderkey AS VARCHAR) || ':'
                                  || CAST(l_linenumber AS VARCHAR) || ':bal'),
                              1, 8), ''), c -> c <> ''),
                       c -> CAST(instr('0123456789abcdef', c) - 1 AS BIGINT)),
                       (a, x) -> a * 16 + x) AS h
            FROM lineitem
        ),
        counts AS (
            SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
                   CAST(SUM(1 - pos) AS BIGINT) AS n_neg
            FROM base
        ),
        kept AS (
            SELECT b.pos,
                   CASE WHEN b.pos = 1
                             OR b.h * c.n_neg < 4294967296 * c.n_pos
                        THEN 1 ELSE 0 END AS keep
            FROM base b CROSS JOIN counts c
        )
        SELECT CASE WHEN pos = 1 THEN 'positive' ELSE 'negative' END
                   AS label,
               CAST(COUNT(*) AS BIGINT) AS n_before,
               CAST(SUM(keep) AS BIGINT) AS n_after,
               ROUND(CAST(SUM(keep) AS DOUBLE) / COUNT(*), 6) AS keep_rate
        FROM kept
        GROUP BY pos
        ORDER BY label
    """,
    tags=("SAMPLE-balance",),
)
def sample_balanced_downsample(spark, sf_dir):
    """Class-balanced negative downsampling — the standard prepare
    step for imbalanced binary training sets: keep EVERY positive
    (returned lines, ~25%), hash-downsample negatives to the positive
    count.  The keep rule for a negative is the exact integer
    cross-product h·n_neg < 2³²·n_pos (h = first 8 md5 hex digits as
    a 32-bit uniform) — no float ratio, no boundary ambiguity, and
    the SAME rows survive on any engine, any partitioning, any rerun
    (the property that makes the downsample reproducible across
    training runs).  Declared output is the per-class census; the
    row-level frame is the obvious `WHERE keep = 1` on the same
    expression.

    Exactness: class counts are exact BIGINTs from one pass; the
    keep decision is exact integer arithmetic (h·n_neg ≤ 2³²·2⁶³?
    h < 2³², n_neg ≤ 2³¹ keeps the product inside int64 through
    ~2e9 negatives; DECIMAL swap documented past that).

    100 TB posture: two passes (count, then gate) — the count frame
    is 1 row broadcast into the gating scan; at scale the gate
    usually fuses into the next pipeline stage so the downsample
    costs zero extra shuffles."""
    li = load_table(spark, sf_dir, "lineitem")
    pos = F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("l_orderkey").cast("string"),
                    F.lit(":"),
                    F.col("l_linenumber").cast("string"),
                    F.lit(":bal"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    base = li.select(pos.alias("pos"), h.alias("h"))
    counts = base.agg(
        F.sum("pos").cast("bigint").alias("n_pos"),
        F.sum(1 - F.col("pos")).cast("bigint").alias("n_neg"),
    )
    kept = base.crossJoin(F.broadcast(counts)).select(
        "pos",
        F.when(
            (F.col("pos") == 1)
            | (F.col("h") * F.col("n_neg") < F.lit(4294967296) * F.col("n_pos")),
            1,
        )
        .otherwise(0)
        .alias("keep"),
    )
    return (
        kept.groupBy("pos")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_before"),
            F.sum("keep").cast("bigint").alias("n_after"),
        )
        .select(
            F.when(F.col("pos") == 1, "positive").otherwise("negative").alias("label"),
            "n_before",
            "n_after",
            F.round(F.col("n_after").cast("double") / F.col("n_before"), 6).alias(
                "keep_rate"
            ),
        )
        .orderBy("label")
    )
