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
        f"len(list_filter(string_split(lower(text), ' '), t -> t IN ({words})))"
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
    toks = F.split(F.lower("text"), " ")
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
