"""Declared-query registry — the engine's t2 contract surface.

Every operator from SURVEY.md §2 registers here as a ``QuerySpec``:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus, where the
semantics are exactly SQL-expressible, the equivalent DuckDB oracle SQL.
``__spark_entry__.py`` (the driver contract) re-exports this registry.

Rule (SURVEY.md §2): never register a query that hasn't been
hash-verified locally against DuckDB via ``selfcheck.py`` — declaring
is opting into being graded on it.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: SparkQuery
    oracle: str | None  # DuckDB ANSI SQL; None → driver's weaker rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: register a declared query under SURVEY §2 key ``name``."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query key: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tuple(tags))
        return fn

    return deco


# The driver's per-round correctness sample (~50 keys) tracks the order of
# the dict returned by queries().  This list pins never-yet-driver-graded
# keys (and then the keys whose last grading is oldest) to the FRONT of the
# iteration order so each round's sample lands on the least-evidenced
# queries first; everything else follows in registration order.  Ordering is
# presentation-only — it does not change any query or oracle, and it is
# DISCLOSED here and in README.md so the grading-driver owner can override
# it with random/exhaustive sampling at any time (per ADVICE r3).
#
# Round-4 refresh (VERDICT r3 item 1): front-load the 27 keys that have no
# CORRECTNESS row in r1-r3 (the 15 tpch_* + round-3 LLM additions + the 6
# that sat just past r3's 50-key cutoff), then new round-4 keys, then the 9
# keys whose latest grading is r1.  Everything r2/r3-green follows in
# registration order.
_GRADING_PRIORITY: tuple[str, ...] = (
    # --- never driver-graded: TPC-H suite (L1-L15) ---
    "tpch_q4_priority_exists",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_profit_by_nation",
    "tpch_q10_returned_items",
    "tpch_q12_latency_classes",
    "tpch_q13_order_distribution",
    "tpch_q14_promo_share",
    "tpch_q15_top_supplier",
    "tpch_q17_small_qty_revenue",
    "tpch_q18_large_orders",
    "tpch_q19_disjunctive_revenue",
    "tpch_q21_waiting_supplier",
    "tpch_q22_dormant_customers",
    # --- never driver-graded: round-3 LLM-pipeline additions ---
    "dedup_minhash_exact",
    "text_oov_rate",
    "embed_pq_codes",
    "sim_topk_pq_adc",
    "sim_topk_pq_rerank",
    "er_blocked_fuzzy_match",
    # --- never driver-graded: missed r3's 50-key cutoff ---
    "merge_upsert_orders",
    "funnel_signup_purchase",
    "agg_histogram",
    "vocab_top_tokens",
    "text_ngrams_trigram",
    "text_pii_scrub",
    # --- new round-4 keys (never graded by construction) ---
    "tpch_q9_profit_selective",
    "sim_knn_ivf_exact",
    "stream_foreachbatch_sink",
    "dedup_embedding_cosine",
    "scan_dpp_partitioned",
    "dedup_simhash_exact",
    "dedup_substring_windows",
    "dedup_semantic_centroids",
    "stream_sliding_1h_15m_live",
    "stream_session_gap_30m_live",
    "dq_distribution_drift",
    "dedup_minhash_incremental",
    "pipeline_dedup_cascade",
    "join_bucketed_colocated",
    "ts_ewma_hourly",
    "cohort_weekly_retention",
    "stream_stateful_counters_live",
    "graph_reachability_paths",
    "ts_forward_fill",
    "agg_robust_mad",
    "text_unigram_surprisal",
    "stream_dedup_watermark_live",
    "fn_try_arithmetic",
    "agg_mode_deterministic",
    "win_ntile_quartiles",
    # --- stalest evidence: latest grading is r1 ---
    "text_tfidf_sql",
    "text_quality_score",
    "join_interval",
    "join_asof",
    "cdc_snapshot_diff",
    "etl_surrogate_keys",
    "scd2_intervals",
    "project_compute",
    "filter_compound",
)


def _ordered_items() -> list[tuple[str, QuerySpec]]:
    head = [(k, REGISTRY[k]) for k in _GRADING_PRIORITY if k in REGISTRY]
    seen = set(_GRADING_PRIORITY)
    tail = [(k, spec) for k, spec in REGISTRY.items() if k not in seen]
    return head + tail


def queries() -> dict[str, SparkQuery]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in _ordered_items()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {name: spec.oracle for name, spec in _ordered_items() if spec.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (import side effect)."""
    global _LOADED
    if _LOADED:
        return
    import etl_builder_spark.functions.scalar  # noqa: F401
    import etl_builder_spark.functions.sketches  # noqa: F401
    import etl_builder_spark.functions.udtf_ops  # noqa: F401
    import etl_builder_spark.llm.cluster  # noqa: F401
    import etl_builder_spark.llm.curation  # noqa: F401
    import etl_builder_spark.llm.dedup  # noqa: F401
    import etl_builder_spark.llm.embed_dedup  # noqa: F401
    import etl_builder_spark.llm.embeddings  # noqa: F401
    import etl_builder_spark.llm.fingerprint  # noqa: F401
    import etl_builder_spark.llm.ivf  # noqa: F401
    import etl_builder_spark.llm.langid  # noqa: F401
    import etl_builder_spark.llm.multimodal  # noqa: F401
    import etl_builder_spark.llm.packing  # noqa: F401
    import etl_builder_spark.llm.pq  # noqa: F401
    import etl_builder_spark.llm.sampling  # noqa: F401
    import etl_builder_spark.llm.similarity  # noqa: F401
    import etl_builder_spark.llm.substring  # noqa: F401
    import etl_builder_spark.llm.text  # noqa: F401
    import etl_builder_spark.llm.training_pipeline  # noqa: F401
    import etl_builder_spark.operators.aggregates  # noqa: F401
    import etl_builder_spark.operators.asof  # noqa: F401
    import etl_builder_spark.operators.cdc  # noqa: F401
    import etl_builder_spark.operators.filters  # noqa: F401
    import etl_builder_spark.operators.funnel  # noqa: F401
    import etl_builder_spark.operators.fuzzy  # noqa: F401
    import etl_builder_spark.operators.histogram  # noqa: F401
    import etl_builder_spark.operators.joins  # noqa: F401
    import etl_builder_spark.operators.merge  # noqa: F401
    import etl_builder_spark.operators.recursive  # noqa: F401
    import etl_builder_spark.operators.scans  # noqa: F401
    import etl_builder_spark.operators.setops  # noqa: F401
    import etl_builder_spark.operators.sorts  # noqa: F401
    import etl_builder_spark.operators.subqueries  # noqa: F401
    import etl_builder_spark.operators.timeseries  # noqa: F401
    import etl_builder_spark.operators.tpch  # noqa: F401
    import etl_builder_spark.operators.window_frames  # noqa: F401
    import etl_builder_spark.operators.windows  # noqa: F401
    import etl_builder_spark.quality  # noqa: F401
    import etl_builder_spark.sources.bucketed  # noqa: F401
    import etl_builder_spark.sources.partitioned  # noqa: F401
    import etl_builder_spark.sources.roundtrip  # noqa: F401
    import etl_builder_spark.streaming.batch_twins  # noqa: F401
    import etl_builder_spark.udfs  # noqa: F401

    _LOADED = True
