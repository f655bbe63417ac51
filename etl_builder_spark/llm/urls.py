"""URL canonicalization + dedup — the crawl-frontier hygiene step of a
web-scale corpus pipeline: the same page arrives under scheme/case
variants, tracking query params, fragments, and trailing slashes, and
every downstream dedup (exact, minhash, embedding) works better when
the URL key is already canonical.

Canonicalization here is the standard conservative subset — each rule
is value-preserving for HTTP semantics:

1. strip the fragment (``#...`` never reaches the server);
2. lowercase scheme and host (DNS is case-insensitive; paths are NOT
   touched — path case is significant);
3. drop a ``www.`` host prefix;
4. normalize scheme to https;
5. drop tracking params (``utm_*``), then SORT surviving query params
   (param order is almost never significant; sorting makes the key
   canonical);
6. strip a trailing slash from the path.

100 TB posture: pure per-row expressions (regexp + array ops inside
whole-stage codegen) followed by ONE hash aggregation on the canonical
key — the same shape and cost as exact dedup.  No UDFs: Python
``urllib`` parsing per row would be the classic 100×-slower seam.

The corpus ships no URL column, so the fixture SYNTHESIZES one per
document from (source, doc_id) with deliberate variant noise —
case-mangled host, utm params, unstable param order, fragments — such
that groups of doc_ids collapse to one canonical URL.  Both engines
build the same string from the same columns, so the oracle is exact
end-to-end (synthesis + canonicalization + grouping).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_builder_spark.folding import fold_lower
from etl_builder_spark.registry import register
from etl_builder_spark.session import load_table

#: Synthetic URL: scheme/host case varies by doc_id parity, utm noise
#: always present, the ref param's POSITION flips by parity (so only
#: param sorting unifies it), fragment on every third doc.  Path and
#: ref collapse doc_ids mod 50 / mod 3 → same canonical URL.
_URL_SQL = """
    CASE WHEN doc_id % 2 = 0
         THEN 'HTTP://WWW.' || upper(source) || '.EXAMPLE.COM'
         ELSE 'https://www.' || source || '.example.com' END
    || '/docs/' || CAST(doc_id % 50 AS STRING) || '/'
    || CASE WHEN doc_id % 2 = 0
            THEN '?ref=' || CAST(doc_id % 3 AS STRING) || '&utm_source=feed'
            ELSE '?utm_campaign=c' || CAST(doc_id AS STRING)
                 || '&ref=' || CAST(doc_id % 3 AS STRING) END
    || CASE WHEN doc_id % 3 = 0 THEN '#section-' || CAST(doc_id AS STRING)
            ELSE '' END
"""


@register(
    "dedup_url_canonical",
    oracle=f"""
        WITH raw AS (
            SELECT doc_id, {_URL_SQL} AS url FROM documents
        ),
        parts AS (
            SELECT doc_id,
                   regexp_replace(url, '#.*$', '') AS nofrag
            FROM raw
        ),
        split AS (
            SELECT doc_id,
                   regexp_replace(
                       replace(lower(regexp_extract(nofrag, '^[a-zA-Z]+://([^/?]+)', 1)), 'i' || chr(775), 'i'),
                       '^www\\.', '') AS host,
                   regexp_replace(
                       regexp_extract(nofrag, '^[a-zA-Z]+://[^/?]*(/[^?]*)?', 1),
                       '/$', '') AS path,
                   regexp_extract(nofrag, '\\?(.*)$', 1) AS query
            FROM parts
        ),
        canon AS (
            SELECT doc_id,
                   'https://' || host || path ||
                   CASE WHEN qs = '' THEN '' ELSE '?' || qs END AS canonical_url
            FROM (
                SELECT doc_id, host, path,
                       array_to_string(
                           list_sort(list_filter(string_split(query, '&'),
                                     p -> p <> '' AND p NOT LIKE 'utm_%')),
                           '&') AS qs
                FROM split
            )
        )
        SELECT canonical_url,
               COUNT(*) AS n_variants,
               MIN(doc_id) AS keeper_id
        FROM canon
        GROUP BY canonical_url
    """,
    tags=("I-url",),
)
def dedup_url_canonical(spark, sf_dir):
    """Canonical-URL dedup groups: canonicalize every synthesized URL
    (fragment strip, host lowercase + www-strip, https normalize,
    utm-param drop, param sort, trailing-slash strip — all JVM
    expressions) and collapse to (canonical_url, n_variants,
    keeper_id).  On the fixture, case/param/fragment variants of the
    same (source, path, ref) triple MUST land in one group — the
    oracle rebuilds the same synthesis and canonicalization in SQL, so
    the hash check covers every rule end-to-end."""
    d = load_table(spark, sf_dir, "documents")
    url = F.expr(_URL_SQL)
    nofrag = F.regexp_replace(url, r"#.*$", "")
    host = F.regexp_replace(
        fold_lower(F.regexp_extract(nofrag, r"^[a-zA-Z]+://([^/?]+)", 1)), r"^www\.", ""
    )
    path = F.regexp_replace(
        F.regexp_extract(nofrag, r"^[a-zA-Z]+://[^/?]*(/[^?]*)?", 1), r"/$", ""
    )
    query = F.regexp_extract(nofrag, r"\?(.*)$", 1)
    qs = F.array_join(
        F.array_sort(
            F.filter(
                F.split(query, "&"),
                lambda p: (p != "") & ~p.startswith("utm_"),
            )
        ),
        "&",
    )
    canonical = F.concat(
        F.lit("https://"),
        host,
        path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )
    return (
        d.select(canonical.alias("canonical_url"), "doc_id")
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.min("doc_id").alias("keeper_id"),
        )
    )
