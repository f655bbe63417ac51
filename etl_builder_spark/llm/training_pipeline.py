"""End-to-end training-data curation pipeline — the composition the
engine exists for: quality gate → language filter → exact dedup →
token accounting, as ONE Catalyst plan (filters fuse and push into the
scan; the dedup shuffle is the only wide stage).

Declared exactly: every stage is relational, so the full composition
has a faithful SQL oracle — the strongest end-to-end check available.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_builder_spark.registry import register
from etl_builder_spark.session import load_table


@register(
    "pipeline_training_data",
    oracle="""
        WITH gated AS (
            SELECT doc_id, lang, source, n_chars, text,
                   lower(trim(regexp_replace(text, ' +', ' ', 'g'))) AS norm_text,
                   len(string_split(text, ' ')) AS n_tokens
            FROM documents
            WHERE n_chars BETWEEN 50 AND 5000
              AND lang IN ('en', 'de', 'fr')
              AND len(string_split(text, ' ')) >= 5
        ),
        deduped AS (
            SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY norm_text ORDER BY doc_id) AS rn
                FROM gated
            ) WHERE rn = 1
        )
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS avg_tokens,
               COUNT(DISTINCT source) AS n_sources
        FROM deduped
        GROUP BY lang
    """,
    tags=("I-pipeline", "flagship-llm"),
)
def pipeline_training_data(spark, sf_dir):
    """Curate: length/quality gate + language allowlist + normalized
    exact-dedup (keep lowest doc_id) + per-language token accounting.
    At 100 TB: the gates are scan-fused predicates (zero extra passes),
    dedup is one hash shuffle on the normalized key, and the final
    accounting is a two-phase agg — three stages total."""
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " "))
    gated = (
        d.where(
            F.col("n_chars").between(50, 5000)
            & F.col("lang").isin("en", "de", "fr")
            & (n_tokens >= 5)
        )
        .withColumn("norm_text", F.lower(F.trim(F.regexp_replace("text", " +", " "))))
        .withColumn("n_tokens", n_tokens)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("norm_text").orderBy("doc_id")
    deduped = gated.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return deduped.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        (F.sum("n_tokens").cast("double") / F.count(F.lit(1))).alias("avg_tokens"),
        F.countDistinct("source").alias("n_sources"),
    )
