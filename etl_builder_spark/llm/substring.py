"""Exact substring-window duplication detection (training-data dedup
family, SURVEY.md §2 I-rows): find document pairs that share verbatim
runs of ``WINDOW_W`` consecutive tokens — the window-granular form of
suffix-array "exact substring dedup" used on web-crawl corpora, where
near-copies share long literal spans that shingle/MinHash similarity
can under-weight.

Shape (the one that survives 100 TB):

1. Tokenize and slide: every document emits its distinct ``WINDOW_W``-
   token windows (one ``transform(sequence(...))`` expression — JVM
   whole-stage codegen, no Python, no per-row loop).
2. Hot-window guard: windows present in more than ``SUB_DF_CEILING``
   documents are dropped before pairing (broadcast anti-join against
   the provably-small hot list).  Per-window pair fan-out is at most
   DF², so total candidates are bounded by |windows| · ceiling²
   regardless of corpus size — same clamp as dedup.py's DF_CEILING.
3. Pair: a single equi-join on the window key, aggregated to
   (doc_a, doc_b, n_shared).  Never all-pairs; the only quadratic is
   inside one window's bucket, which step 2 bounds.

At real scale the join key would be a 128-bit hash of the window
instead of the window string (cuts shuffle bytes ~10×) and one side
would stride >1 with seed-and-extend verification; both are pure
optimizations of the same plan shape, kept off here so the DuckDB
oracle can mirror the semantics string-for-string.

Fixture: the corpus's texts are all distinct, but its tiny synthetic
vocabulary yields some NATURAL cross-document 15-grams — the operator
must find those too, not just the plants.  Plants: docs 0-59 get a
copy (doc_id + SUB_PLANT_OFFSET) prefixed with five marker tokens, so
each sufficiently long original shares all its interior windows with
its plant.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_builder_spark.registry import register
from etl_builder_spark.session import load_table

#: window width in tokens (the dedup-literature default neighborhood
#: is 50 bytes ≈ 10-20 tokens; 15 keeps fixture docs multi-window)
WINDOW_W = 15

#: planted-copy id shift (distinct from dedup.py's 10000 plants)
SUB_PLANT_OFFSET = 20000

#: hot-window document-frequency ceiling — the scale clamp (step 2)
SUB_DF_CEILING = 1000


@register(
    "dedup_substring_windows",
    oracle=f"""
        WITH everything AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + {SUB_PLANT_OFFSET} AS doc_id,
                   'alpha beta gamma delta epsilon ' || text AS text
            FROM documents WHERE doc_id < 60
        ),
        toks AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM everything
            WHERE len(string_split(text, ' ')) >= {WINDOW_W}
        ),
        idx AS (
            SELECT doc_id, t,
                   unnest(generate_series(1, len(t) - {WINDOW_W - 1})) AS i
            FROM toks
        ),
        wins AS (
            SELECT DISTINCT doc_id,
                   array_to_string(t[i : i + {WINDOW_W - 1}], ' ') AS w
            FROM idx
        ),
        hot AS (
            SELECT w FROM wins GROUP BY w HAVING COUNT(*) > {SUB_DF_CEILING}
        ),
        kept AS (SELECT * FROM wins WHERE w NOT IN (SELECT w FROM hot))
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
        FROM kept a JOIN kept b ON a.w = b.w AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    """,
    tags=("I-dedup-substring",),
)
def dedup_substring_windows(spark, sf_dir):
    """Document pairs sharing ≥1 verbatim ``WINDOW_W``-token window,
    with the count of distinct shared windows — exact-oracle-checked
    end-to-end (window extraction, hot guard, pairing, counts)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = d.where(F.col("doc_id") < 60).select(
        (F.col("doc_id") + SUB_PLANT_OFFSET).alias("doc_id"),
        F.concat(F.lit("alpha beta gamma delta epsilon "), F.col("text")).alias("text"),
    )
    everything = d.unionByName(planted)
    toks = everything.withColumn("t", F.split("text", " ")).where(
        F.size("t") >= WINDOW_W
    )
    wins = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(t) - {WINDOW_W - 1}),"
                f" i -> array_join(slice(t, i, {WINDOW_W}), ' '))"
            )
        ).alias("w"),
    ).distinct().persist()
    hot = (
        wins.groupBy("w")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") > SUB_DF_CEILING)
        .select("w")
    )
    # wins feeds both the hot-window census and the pairing; kept is
    # self-joined — persist both so the window explosion runs once,
    # not once per reference (spill-safe MEMORY_AND_DISK default)
    kept = wins.join(F.broadcast(hot), "w", "left_anti").persist()
    a = kept.select(F.col("doc_id").alias("doc_a"), "w")
    b = kept.select(F.col("doc_id").alias("doc_b"), "w")
    return (
        a.join(b, "w")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
