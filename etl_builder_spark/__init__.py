"""etl_builder_spark — a PySpark-native analytics/ETL engine.

A from-scratch engine with the query & data-processing capabilities of
yjhatfdu/etl-builder (reference checkout at /root/reference — empty this
round, see SURVEY.md §0), re-expressed Spark-first: all semantics land in
Catalyst-visible DataFrame/SQL constructs so predicate pushdown, column
pruning, AQE, broadcast selection and whole-stage codegen apply for free.

Layout
------
- ``session``    : SparkSession factory + table catalog (UTC, Arrow, AQE).
- ``registry``   : the declared-query registry — each operator from
  SURVEY.md §2 registers a (spark_fn, oracle_sql) pair here; the driver
  contract file ``__spark_entry__.py`` re-exports it.
- ``operators/`` : relational core — scans, filters, joins, aggregates,
  windows, sorts, set ops, as-of/interval join rewrites.
- ``functions/`` : scalar function families (string/datetime/math/array/
  map/json/conditional) as composite declared queries.
- ``llm/``       : LLM-data-pipeline operators — dedup (exact, MinHash-LSH,
  SimHash, n-gram Jaccard), similarity search (brute-force + LSH),
  text analysis, multimodal column plumbing.
- ``streaming/`` : Structured Streaming ops (windows, sessions, watermark,
  stateful) + their deterministic batch twins.
- ``udfs``       : pandas-UDF surface (scalar / grouped-agg / grouped-map).

Determinism policy (SURVEY.md §7.2): every declared query is hash-compared
against DuckDB by the driver, so all monetary aggregates cast inputs to
DECIMAL(18,2) *before* arithmetic (measured: every monetary column in the
corpus is an exact 2-dp value, so the cast is lossless and decimal math is
bit-identical across engines); ratios round to 6 dp at the final projection;
session timezone pinned UTC; every ranked/limited query carries a
total-order tiebreaker; collect_list is always array_sort-wrapped.
"""

__version__ = "0.1.0"

from etl_builder_spark.registry import REGISTRY, QuerySpec, register  # noqa: F401
from etl_builder_spark.session import get_spark, load_table, register_views  # noqa: F401
