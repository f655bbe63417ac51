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

from etl_builder_spark.folding import fold_lower
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


#: sliding chunker: window of 32 tokens advancing 24 (8-token overlap)
CHUNK_W = 32
CHUNK_S = 24


@register(
    "chunk_sliding_overlap",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, string_split(replace(lower(text), 'i' || chr(775), 'i'), ' ') AS parts
            FROM documents
        ),
        starts AS (
            SELECT doc_id, parts,
                   unnest(generate_series(
                       0,
                       CAST(greatest(ceil((len(parts) - {CHUNK_W})
                                     / CAST({CHUNK_S} AS DOUBLE)), 0) AS BIGINT)
                   )) AS chunk_idx
            FROM toks
        )
        SELECT doc_id,
               CAST(chunk_idx AS INT) AS chunk_idx,
               CAST(len(list_slice(parts, chunk_idx * {CHUNK_S} + 1,
                                   chunk_idx * {CHUNK_S} + {CHUNK_W})) AS INT)
                   AS n_tokens,
               md5(array_to_string(
                   list_slice(parts, chunk_idx * {CHUNK_S} + 1,
                              chunk_idx * {CHUNK_S} + {CHUNK_W}), ' '))
                   AS chunk_md5
        FROM starts
    """,
    tags=("I-chunk-sliding",),
)
def chunk_sliding_overlap(spark, sf_dir):
    """Sliding-window chunking with overlap (window 32, stride 24 →
    8-token overlap) — the RAG/embedding chunker, where overlap keeps
    boundary-spanning context retrievable (vs the disjoint packing of
    chunk_fixed_tokens).  Start offsets come from ``sequence()`` per
    doc and the chunk is one ``slice()`` — expression-only row
    explosion, ~n/stride output rows per doc, no UDF; each chunk
    carries its md5 (portable both engines) so content — not just
    counts — sits under the hash.  Scales as a pure map: no shuffle at
    all unless a downstream groupBy asks for one."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split(fold_lower("text"), " ").alias("parts"))
    n_chunks_minus1 = F.greatest(
        F.ceil((F.size("parts") - F.lit(CHUNK_W)) / F.lit(float(CHUNK_S))), F.lit(0)
    ).cast("long")
    starts = toks.select(
        "doc_id",
        "parts",
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks_minus1)).alias("chunk_idx"),
    )
    chunk = F.slice(
        F.col("parts"), (F.col("chunk_idx") * CHUNK_S + 1).cast("int"), CHUNK_W
    )
    return starts.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size(chunk).alias("n_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    )
