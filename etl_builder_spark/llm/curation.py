"""Corpus-curation operators a training-data pipeline runs between raw
crawl and tokenizer: boilerplate detection, repetition scoring,
benchmark-contamination checks, fixed-size chunking, near-dup cluster
representative selection, and length-band filtering.

Scale posture: everything here is expression-only (split/explode/
window/join on the JVM side) — no Python in the hot path.  The
shuffles are all on bounded-cardinality keys (n-grams, cluster hashes)
with map-side partial aggregation; the contamination check broadcasts
the benchmark n-gram set, which is the right shape at 100 TB where the
held-out benchmark is tiny relative to the crawl.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_builder_spark.folding import fold_lower
from etl_builder_spark.registry import register
from etl_builder_spark.session import load_table

# Deterministic benchmark membership: ~1% of docs stand in for the
# held-out eval set in the contamination check.
_BENCH_MOD = 97

#: Boilerplate doc-frequency cut, expressed as an integer reciprocal
#: (an n-gram is boilerplate when it appears in >= 1/N of documents —
#: integer arithmetic so a boundary count can't flip on float rounding).
#: PRODUCTION default: ~5% (1/20), the classic crawl-cleaner setting.
#: The registered query runs at the FIXTURE cut 0.5% (1/200) because
#: the synthetic corpus shares no header/footer text and a 5% cut
#: returns zero rows at every test SF, making the oracle comparison
#: vacuous.  Callers reusing boilerplate detection as a production
#: drop-list (see dedup.DF_CEILING) should pass the production value.
BOILERPLATE_PROD_RECIPROCAL = 20
BOILERPLATE_FIXTURE_RECIPROCAL = 200


def _doc_tokens(df, text_col: str = "text"):
    """documents → (doc_id, tokens array), lower-cased whitespace split."""
    return df.select("doc_id", F.split(fold_lower(F.col(text_col)), " ").alias("toks"))


def _ngrams(df, n: int):
    """(doc_id, toks) → distinct (doc_id, ngram) via slide-window join.

    Expression-only: transform over token positions, no UDF.  At scale
    this is one explode with the n-gram string built JVM-side.
    """
    grams = F.transform(
        F.sequence(F.lit(0), F.size("toks") - F.lit(n)),
        lambda i: F.array_join(F.slice("toks", i + 1, n), " "),
    )
    return (
        df.where(F.size("toks") >= n)
        .select("doc_id", F.explode(grams).alias("ngram"))
        .distinct()
    )


@register(
    "text_boilerplate_ngrams",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, string_split(replace(lower(text), 'i' || chr(775), 'i'), ' ') AS toks
            FROM documents
        ),
        grams AS (
            SELECT DISTINCT doc_id,
                   array_to_string(toks[i + 1 : i + 3], ' ') AS ngram
            FROM toks, unnest(generate_series(0, len(toks) - 3)) AS g(i)
            WHERE len(toks) >= 3
        ),
        n AS (SELECT COUNT(*) AS n_docs FROM documents)
        SELECT ngram,
               COUNT(*) AS n_docs_with,
               ROUND(CAST(COUNT(*) AS DOUBLE) / n.n_docs, 6) AS doc_frac
        FROM grams CROSS JOIN n
        GROUP BY ngram, n.n_docs
        HAVING COUNT(*) * {BOILERPLATE_FIXTURE_RECIPROCAL} >= n.n_docs
    """,
    tags=("I-boilerplate",),
)
def text_boilerplate_ngrams(spark, sf_dir):
    """Boilerplate detection: trigrams present in >= 1/RECIPROCAL of
    documents (the registered query runs at the fixture cut — see
    BOILERPLATE_FIXTURE_RECIPROCAL for why, and use
    BOILERPLATE_PROD_RECIPROCAL when reusing this as a production
    drop-list).

    The classic crawl-cleaning primitive (header/footer/nav text shows
    up verbatim across pages).  One shuffle on the ngram key with
    map-side combine; the distinct-per-doc guard means a doc repeating
    its own boilerplate doesn't inflate the doc frequency.
    """
    return boilerplate_ngrams(
        load_table(spark, sf_dir, "documents"), BOILERPLATE_FIXTURE_RECIPROCAL
    )


def boilerplate_ngrams(d, reciprocal: int = BOILERPLATE_PROD_RECIPROCAL):
    """Trigrams in >= 1/``reciprocal`` of ``d``'s documents.  The cut
    is integer arithmetic (``n_docs_with * reciprocal >= n_docs``), so
    a count sitting exactly on the boundary can't flip on float
    rounding between engines."""
    grams = _ngrams(_doc_tokens(d), 3)
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        grams.groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n_docs_with"))
        .crossJoin(F.broadcast(n))
        .withColumn(
            "doc_frac", F.round(F.col("n_docs_with").cast("double") / F.col("n_docs"), 6)
        )
        .where(F.col("n_docs_with") * reciprocal >= F.col("n_docs"))
        .select("ngram", "n_docs_with", "doc_frac")
    )


@register(
    "text_repetition_ratio",
    oracle="""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(replace(lower(text), 'i' || chr(775), 'i'), ' ')) AS token
            FROM documents
        ),
        tf AS (
            SELECT doc_id, token, COUNT(*) AS c
            FROM toks WHERE token <> '' GROUP BY doc_id, token
        )
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n_tokens,
               COUNT(*) AS n_distinct,
               MAX(c) AS max_token_freq,
               ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 6) AS repetition_ratio,
               ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(c), 6) AS distinct_ratio,
               CAST(MAX(c) AS DOUBLE) / SUM(c) > 0.2 AS is_repetitive
        FROM tf
        GROUP BY doc_id
    """,
    tags=("I-repetition",),
)
def text_repetition_ratio(spark, sf_dir):
    """Per-document repetition scoring: max token frequency and
    distinct-token ratio — the cheap filter that catches degenerate
    "word word word ..." crawl pages before any expensive dedup runs.

    Single shuffle on doc_id (token counts partial-aggregate map-side).
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(fold_lower("text"), " ")).alias("token")
    ).where(F.col("token") != "")
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("c"))
    return tf.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("max_token_freq"),
        F.round(F.max("c").cast("double") / F.sum("c"), 6).alias("repetition_ratio"),
        F.round(F.count(F.lit(1)).cast("double") / F.sum("c"), 6).alias("distinct_ratio"),
        (F.max("c").cast("double") / F.sum("c") > 0.2).alias("is_repetitive"),
    )


@register(
    "text_contamination_check",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, string_split(replace(lower(text), 'i' || chr(775), 'i'), ' ') AS toks
            FROM documents
        ),
        grams AS (
            SELECT DISTINCT doc_id,
                   array_to_string(toks[i + 1 : i + 5], ' ') AS ngram
            FROM toks, unnest(generate_series(0, len(toks) - 5)) AS g(i)
            WHERE len(toks) >= 5
        ),
        bench AS (
            SELECT DISTINCT ngram FROM grams WHERE doc_id % {_BENCH_MOD} = 0
        ),
        train AS (
            SELECT * FROM grams WHERE doc_id % {_BENCH_MOD} <> 0
        )
        SELECT t.doc_id,
               COUNT(*) AS n_ngrams,
               CAST(SUM(CASE WHEN b.ngram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_contaminated,
               ROUND(CAST(SUM(CASE WHEN b.ngram IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                     / COUNT(*), 6) AS contamination_frac
        FROM train t LEFT JOIN bench b USING (ngram)
        GROUP BY t.doc_id
    """,
    tags=("I-contamination",),
)
def text_contamination_check(spark, sf_dir):
    """Benchmark-contamination check: fraction of each training doc's
    5-grams that appear in the held-out benchmark slice
    (doc_id % 97 == 0 stands in for the eval set).

    100 TB shape: a REAL benchmark n-gram set (MMLU/GSM8K/etc.) is
    bounded — a few million n-grams — so it broadcasts and the check is
    a map-side hash probe over the crawl with no shuffle of the
    training-side n-grams (the only shuffle is the per-doc
    re-aggregation).  Caveat: the modulo slice used here is a TEST
    STAND-IN that grows linearly with the corpus; the broadcast
    assumption holds only for a bounded benchmark set.  If the "bench"
    side were ever corpus-proportional, drop the ``F.broadcast`` hint
    and let it shuffle-join.
    """
    d = load_table(spark, sf_dir, "documents")
    grams = _ngrams(_doc_tokens(d), 5)
    bench = (
        grams.where(F.col("doc_id") % _BENCH_MOD == 0).select("ngram").distinct()
        .withColumn("hit", F.lit(1))
    )
    train = grams.where(F.col("doc_id") % _BENCH_MOD != 0)
    return (
        train.join(F.broadcast(bench), "ngram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_contaminated"),
            F.round(
                F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("double") / F.count(F.lit(1)), 6
            ).alias("contamination_frac"),
        )
    )


@register(
    "chunk_fixed_tokens",
    oracle="""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS toks
            FROM documents
        )
        SELECT doc_id,
               CAST(i / 64 AS BIGINT) AS chunk_id,
               array_to_string(toks[i + 1 : i + 64], ' ') AS chunk_text,
               CAST(least(64, len(toks) - i) AS INT) AS chunk_tokens
        FROM toks, unnest(generate_series(0, len(toks) - 1, 64)) AS g(i)
    """,
    tags=("I-chunking",),
)
def chunk_fixed_tokens(spark, sf_dir):
    """Fixed-size chunking: split every document into 64-token chunks
    (final partial chunk kept) — the pre-tokenizer sharding step of a
    training pipeline and the unit RAG indexes embed.

    Expression-only (sequence + slice + array_join inside one
    projection): zero shuffles — chunking is embarrassingly parallel
    and stays that way at 100 TB.
    """
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", F.split("text", " ").alias("toks"))
    starts = F.sequence(F.lit(0), F.size("toks") - F.lit(1), F.lit(64))
    return t.select(
        "doc_id", F.explode(starts).alias("i"), "toks"
    ).select(
        "doc_id",
        (F.col("i") / 64).cast("bigint").alias("chunk_id"),
        F.array_join(F.slice("toks", F.col("i") + 1, 64), " ").alias("chunk_text"),
        F.least(F.lit(64), F.size("toks") - F.col("i")).cast("int").alias("chunk_tokens"),
    )


@register(
    "dedup_cluster_representative",
    oracle="""
        WITH keyed AS (
            SELECT doc_id, text, n_chars,
                   md5(regexp_replace(replace(lower(trim(text, ' ')), 'i' || chr(775), 'i'), ' +', ' ', 'g')) AS norm_key
            FROM documents
        ),
        ranked AS (
            SELECT doc_id, norm_key, n_chars,
                   ROW_NUMBER() OVER (
                       PARTITION BY norm_key
                       ORDER BY n_chars DESC, doc_id ASC
                   ) AS rn,
                   COUNT(*) OVER (PARTITION BY norm_key) AS cluster_size
        FROM keyed
        )
        SELECT doc_id, norm_key, CAST(cluster_size AS BIGINT) AS cluster_size
        FROM ranked WHERE rn = 1
    """,
    tags=("I-representative",),
)
def dedup_cluster_representative(spark, sf_dir):
    """Representative selection after dedup clustering: one doc per
    normalized-text cluster, keeping the longest (ties → lowest
    doc_id).  This is the "which copy do we train on" policy step that
    follows exact/near dedup.

    One hash shuffle on the cluster key; the window is per-cluster so
    WindowGroupLimit-style pruning applies, and cluster keys are
    high-cardinality → no skew concern.
    """
    d = load_table(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        "n_chars",
        F.md5(F.regexp_replace(fold_lower(F.trim("text")), " +", " ")).alias("norm_key"),
    )
    w = Window.partitionBy("norm_key").orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
    wc = Window.partitionBy("norm_key")
    return (
        keyed.withColumn("rn", F.row_number().over(w))
        .withColumn("cluster_size", F.count(F.lit(1)).over(wc))
        .where(F.col("rn") == 1)
        .select("doc_id", "norm_key", F.col("cluster_size").cast("bigint").alias("cluster_size"))
    )


@register(
    "filter_length_band",
    oracle="""
        WITH bounds AS (
            SELECT floor(quantile_cont(n_chars, 0.05)) AS lo,
                   ceil(quantile_cont(n_chars, 0.95)) AS hi
            FROM documents
        )
        SELECT d.doc_id, d.lang, d.n_chars
        FROM documents d, bounds b
        WHERE d.n_chars >= b.lo AND d.n_chars <= b.hi
    """,
    tags=("I-lengthband",),
)
def filter_length_band(spark, sf_dir):
    """Length-band filter: drop the shortest 5% and longest 5% of the
    corpus by exact percentile — outlier docs are disproportionately
    junk (empty shells, concatenation bugs).

    Spark ``percentile`` and DuckDB ``quantile_cont`` share linear
    interpolation; bounds are floor/ceil'd to integers so the
    comparison is float-jitter-proof.  The percentile is a single
    tiny aggregate, broadcast back over the scan — at 100 TB swap in
    ``percentile_approx`` (documented scale path) to avoid the exact
    percentile's full sort of the value column.
    """
    d = load_table(spark, sf_dir, "documents")
    bounds = d.agg(
        F.floor(F.expr("percentile(n_chars, 0.05)")).alias("lo"),
        F.ceil(F.expr("percentile(n_chars, 0.95)")).alias("hi"),
    )
    return (
        d.crossJoin(F.broadcast(bounds))
        .where((F.col("n_chars") >= F.col("lo")) & (F.col("n_chars") <= F.col("hi")))
        .select("doc_id", "lang", "n_chars")
    )
