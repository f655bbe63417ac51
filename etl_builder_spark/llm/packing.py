"""Context-window packing — sharding a curated corpus into
token-budget windows for training (the step after curation and before
tokenized shard writing in an LLM data pipeline).

Deterministic closed-form variant: docs are ordered (per language) by
doc_id, and a document starts window ``floor(preceding_tokens /
budget)`` where preceding_tokens is the running token total BEFORE the
document. That is sequential token-budget sharding — a document can
straddle a boundary (real packers then split or pad; the window
assignment is the distributable part). Pure window-function plan: one
shuffle on the partition key, sort within partition, O(1) state.

100 TB posture: PARTITION BY lang alone would serialize each language
on one task; at scale pre-shard to (lang, hash(doc_id) % k) and pack
within shards — the helper exposes ``shard_count`` for exactly that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_builder_spark.registry import register
from etl_builder_spark.session import load_table

BUDGET = 2048


def pack_windows(
    docs: DataFrame,
    budget: int = BUDGET,
    lang_col: str = "lang",
    order_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    shard_count: int | None = None,
) -> DataFrame:
    """Assign each doc a (shard-local) window id by running token count.

    With ``shard_count`` set, packing is parallel per (lang, shard) —
    the 100 TB path; without it, per-lang sequential (exactly matches
    a single global ordering, used by the declared oracle query).
    """
    parts = [lang_col]
    out = docs
    if shard_count:
        out = out.withColumn("__shard", F.pmod(F.xxhash64(order_col), F.lit(shard_count)))
        parts.append("__shard")
    w = Window.partitionBy(*parts).orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = F.sum(tokens_col).over(w)
    out = out.withColumn("cum_tokens", cum).withColumn(
        "window_id", F.floor((F.col("cum_tokens") - F.col(tokens_col)) / F.lit(budget))
    )
    return out.drop("__shard") if shard_count else out


@register(
    "pack_context_windows",
    oracle=f"""
        WITH toks AS (
            SELECT lang, doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
            FROM documents
        )
        SELECT lang, doc_id, n_tokens,
               CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS cum_tokens,
               CAST(floor((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
                    / {BUDGET}.0) AS BIGINT) AS window_id
        FROM toks
    """,
    tags=("I-packing",),
)
def pack_context_windows(spark, sf_dir):
    """Per-language sequential packing of the documents corpus into
    2048-token windows; oracle states the same running-sum closed form."""
    d = load_table(spark, sf_dir, "documents").select(
        "lang", "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    return pack_windows(d).select("lang", "doc_id", "n_tokens", "cum_tokens", "window_id")
