"""Language-ID heuristic (training-data-pipeline text surface):
marker-word scoring — count hits against per-language stopword marker
sets, argmax with a fixed precedence chain. Expression-only, exactly
mirrored in SQL. (On this synthetic corpus the labels are arbitrary;
the operator demonstrates the scoring/argmax pattern that a real
n-gram model plugs into.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from etl_builder_spark.folding import fold_lower
from etl_builder_spark.registry import register
from etl_builder_spark.session import load_table

MARKERS = {
    "en": ("the", "and", "of", "to", "is", "fast", "key"),
    "de": ("der", "die", "und", "ist", "das", "nicht"),
    "es": ("el", "la", "de", "que", "es", "los"),
}


def _score(tokens: Column, lang: str) -> Column:
    marker = F.array(*[F.lit(w) for w in MARKERS[lang]])
    return F.size(F.filter(tokens, lambda t: F.array_contains(marker, t)))


def _sql_score(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in MARKERS[lang])
    return (
        f"len(list_filter(string_split(replace(lower(text), 'i' || chr(775), 'i'), ' '), t -> t IN ({words})))"
    )


@register(
    "text_langid_heuristic",
    oracle=f"""
        WITH scored AS (
            SELECT doc_id, lang,
                   {_sql_score('en')} AS s_en,
                   {_sql_score('de')} AS s_de,
                   {_sql_score('es')} AS s_es
            FROM documents
        )
        SELECT doc_id, lang, s_en, s_de, s_es,
               CASE WHEN s_en >= s_de AND s_en >= s_es THEN 'en'
                    WHEN s_de >= s_es THEN 'de'
                    ELSE 'es' END AS lang_guess,
               (CASE WHEN s_en >= s_de AND s_en >= s_es THEN 'en'
                     WHEN s_de >= s_es THEN 'de'
                     ELSE 'es' END = lang) AS agrees_with_label
        FROM scored
    """,
    tags=("I-langid",),
)
def text_langid_heuristic(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(fold_lower("text"), " ")
    scored = d.select(
        "doc_id",
        "lang",
        _score(toks, "en").alias("s_en"),
        _score(toks, "de").alias("s_de"),
        _score(toks, "es").alias("s_es"),
    )
    guess = (
        F.when((F.col("s_en") >= F.col("s_de")) & (F.col("s_en") >= F.col("s_es")), "en")
        .when(F.col("s_de") >= F.col("s_es"), "de")
        .otherwise("es")
    )
    return scored.select(
        "*",
        guess.alias("lang_guess"),
        (guess == F.col("lang")).alias("agrees_with_label"),
    )


@register(
    "ml_naive_bayes_langid",
    oracle="""
        WITH toks AS (
            SELECT doc_id, lang,
                   unnest(list_filter(string_split(replace(lower(text), 'i' || chr(775), 'i'), ' '),
                                      t -> t <> '')) AS tok
            FROM documents
        ),
        class_tok AS (
            SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS c
            FROM toks GROUP BY 1, 2
        ),
        class_tot AS (
            SELECT lang, CAST(SUM(c) AS BIGINT) AS tot FROM class_tok GROUP BY 1
        ),
        vocab AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM toks),
        prior AS (
            SELECT lang,
                   CAST(ROUND(ln(CAST(COUNT(*) AS DOUBLE)
                                 / (SELECT COUNT(*) FROM documents)), 7)
                        AS DECIMAL(28,7)) AS logprior
            FROM documents GROUP BY lang
        ),
        doc_tok AS (
            SELECT doc_id, lang AS true_lang, tok, CAST(COUNT(*) AS BIGINT) AS f
            FROM toks GROUP BY 1, 2, 3
        ),
        scored AS (
            SELECT d.doc_id, d.true_lang, ct.lang AS cand,
                   CAST(SUM(d.f * CAST(ROUND(ln((COALESCE(k.c, 0) + 1.0)
                                                / (ct.tot + vb.v)), 7)
                                       AS DECIMAL(28,7))) AS DECIMAL(38,7))
                       AS loglik
            FROM doc_tok d
            CROSS JOIN class_tot ct
            CROSS JOIN vocab vb
            LEFT JOIN class_tok k ON k.lang = ct.lang AND k.tok = d.tok
            GROUP BY 1, 2, 3
        ),
        totals AS (
            SELECT s.doc_id, s.true_lang, s.cand,
                   s.loglik + p.logprior AS score
            FROM scored s JOIN prior p ON p.lang = s.cand
        ),
        best AS (
            SELECT doc_id, MAX(score) AS m FROM totals GROUP BY doc_id
        ),
        pred AS (
            SELECT t.doc_id, t.true_lang, MIN(t.cand) AS pred_lang
            FROM totals t JOIN best b ON b.doc_id = t.doc_id AND t.score = b.m
            GROUP BY 1, 2
        )
        SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM pred GROUP BY 1, 2
    """,
    tags=("ML-nb",),
)
def ml_naive_bayes_langid(spark, sf_dir):
    """Multinomial Naive Bayes language classifier, trained AND
    evaluated distributed (resubstitution confusion matrix) — the
    LEARNED companion to ``text_langid_heuristic``'s marker scoring:
    per-class Laplace-smoothed token log-likelihoods from one
    (lang, token) count aggregation, log-priors from document counts,
    per-document class scores as one sparse join-aggregate, argmax
    with a min-class tie-break.

    Determinism (the ml_logreg_newton_exact transcendental
    discipline): every ln() rounds to 7 dp at the per-(class, token)
    MODEL level — |classes|x|vocab| roundings, not per document — and
    all cross-row accumulation (per-doc score = Sigma f_tok * logp)
    multiplies exact BIGINT term frequencies into 7-dp DECIMALs, so
    scores are order-free exact decimals and the argmax compares
    decimals, never floats.  Ties break to the smallest class name
    via max-then-min-join (no window).

    100 TB posture: training is one token-explode + two hash
    aggregations (model size = vocab x classes, stored distributed);
    scoring joins each doc's DISTINCT tokens against the model per
    class — cost |doc tokens| x |classes|, the sparse NB shape that
    beats dense scoring at any vocabulary; the per-class default
    (unseen token) is a COALESCE against the class constant, not a
    dense fill."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text").persist()
    # r15 optimization (guide §5): the corpus size and vocabulary size
    # were driver-side .count() actions baked in as literals — two
    # eager jobs per build.  Both are now 1-row broadcast frames inside
    # the ONE lazy plan (the oracle always computed them relationally);
    # count()/COUNT(*) produce the same BIGINT, and double division by
    # a cast column equals division by the float literal bit-for-bit.
    n_total = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs_total"))
    toks = d.select(
        "doc_id",
        "lang",
        F.explode(
            F.filter(F.split(fold_lower("text"), " "), lambda t: t != "")
        ).alias("tok"),
    ).persist()
    class_tok = toks.groupBy("lang", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    ).persist()
    class_tot = class_tok.groupBy("lang").agg(F.sum("c").cast("bigint").alias("tot"))
    vocab = class_tok.select("tok").distinct().agg(
        F.count(F.lit(1)).cast("double").alias("v")
    )
    prior = (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
        .crossJoin(F.broadcast(n_total))
        .select(
            "lang",
            F.round(F.log(F.col("cnt") / F.col("n_docs_total")), 7)
            .cast("decimal(28,7)")
            .alias("logprior"),
        )
    )
    doc_tok = toks.groupBy("doc_id", F.col("lang").alias("true_lang"), "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("f")
    )
    logp = (
        F.round(
            F.log(
                (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1.0))
                / (F.col("tot") + F.col("v"))
            ),
            7,
        ).cast("decimal(28,7)")
    )
    scored = (
        doc_tok.crossJoin(
            class_tot.select(F.col("lang").alias("cand"), "tot").crossJoin(
                F.broadcast(vocab)
            )
        )
        .join(
            class_tok.select(
                F.col("lang").alias("kcand"), F.col("tok").alias("ktok"), "c"
            ),
            (F.col("cand") == F.col("kcand")) & (F.col("tok") == F.col("ktok")),
            "left",
        )
        .groupBy("doc_id", "true_lang", "cand")
        .agg(F.sum(F.col("f") * logp).cast("decimal(38,7)").alias("loglik"))
    )
    totals = scored.join(prior.select(F.col("lang").alias("cand"), "logprior"), "cand").select(
        "doc_id", "true_lang", "cand", (F.col("loglik") + F.col("logprior")).alias("score")
    )
    # r15 optimization (guide §2.4): argmax via a per-doc window MAX
    # instead of the groupBy+self-join — the join form recomputed the
    # whole crossJoin-score-aggregate subtree twice (once per side);
    # max().over(partitionBy) needs no sort and no second pass, and the
    # decimal comparison semantics are identical.
    from pyspark.sql import Window

    wdoc = Window.partitionBy("doc_id")
    pred = (
        totals.withColumn("m", F.max("score").over(wdoc))
        .where(F.col("score") == F.col("m"))
        .groupBy("doc_id", "true_lang")
        .agg(F.min("cand").alias("pred_lang"))
    )
    return pred.groupBy("true_lang", "pred_lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
