#!/usr/bin/env python
"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Harness discipline (BASELINE.md): one long-lived session, one throwaway
warm-up action (JIT + parquet footer cache), then time the query matrix
back-to-back. Per-query time = full plan → collect round trip.
"""

from __future__ import annotations

import json
import os
import sys
import time

from etl_builder_spark.registry import REGISTRY, _ensure_loaded
from etl_builder_spark.session import get_spark

#: headline set — the queries BASELINE.md carries DuckDB numbers for,
#: plus one representative per operator family.
HEADLINE = [
    "agg_pricing_summary",   # D1  TPC-H Q1 shape (flagship)
    "topk_global",           # F2  TPC-H Q3 shape
    "join_multiway_star",    # C11 TPC-H Q5 shape
    "win_topk_per_group",    # E2  top-2 per group
    "stream_tumbling_1h",    # J1  tumbling window
    "stream_session_gap_30m",# J3  session gaps-and-islands
    "agg_grouping_sets",     # D4  grouping-sets lattice
    "sim_topk_cosine_sql",   # I6  cosine top-k
    "join_asof",             # C10 as-of join rewrite
    "dedup_exact_normalized",# I4  exact dedup
    "text_tfidf_sql",        # I3  TF-IDF
    "udf_pandas_scalar",     # K1  Arrow-batched pandas UDF
    "pipeline_training_data",# I   end-to-end curation pipeline
    "ts_hourly_gapfill",     # TS  spine gap-fill
    "sim_knn_ivf_exact",     # I7  pinned-quantizer IVF (r4)
    "dedup_embedding_cosine",# I   sign-LSH banded embedding near-dup (r4)
    "dedup_simhash_exact",   # I   48-bit simhash pigeonhole search (r4)
    "scan_dpp_partitioned",  # A   dynamic partition pruning (r4)
    "dedup_substring_windows",   # I  exact substring-window dedup (r4b)
    "dedup_minhash_incremental", # I  batch-vs-corpus incremental dedup (r4b)
    "dedup_semantic_centroids",  # I  SemDeDup centroid blocking (r4b)
    "dq_distribution_drift",     # DQ PSI drift monitor (r4b)
    "pipeline_dedup_cascade",    # I  3-stage dedup composition (r4b)
    "graph_reachability_paths",  # C  recursive-CTE hierarchy walk (r4b)
    "sessionize_events_gap",     # TS batch gap sessionization (r5)
    "ts_resample_ohlc",          # TS de-windowed OHLC resample (r5)
    "sim_knn_ivfpq",             # I  IVF-PQ composed search (r5)
    "dedup_url_canonical",       # I  URL canonicalize + group (r5)
    "dedup_text_containment",    # I  trigram containment dedup (r5)
    "graph_pagerank_fixed",      # GR 3-round decimal-exact PageRank (r5b)
    "ts_interpolate_linear",     # TS linear gap interpolation (r5b)
    "dedup_token_sort",          # I  token-multiset dedup (r5b)
    "text_zipf_fit",             # I  per-lang Zipf fit (r5b)
    "multimodal_frame_sample",   # I  mapInPandas frame explosion (r5b)
    "sim_sparse_tfidf_pairs",    # I  sparse TF-IDF cosine pair ranking (r5c)
    "market_basket_pairs",       # D  co-purchase pair census (r5c)
    "ts_rolling_dau_wau",        # TS contribution-explode WAU (r5c)
    "ml_feature_hashing",        # ML hashing-trick featurizer (r5c)
    "path_topk_sessions",        # TS session journey paths (r5c)
    "ml_pca_power_component",    # ML distributed power iteration (r5c)
    "stats_poisson_bootstrap_ci",# STATS hash-weighted bootstrap (r5c)
    "dedup_frame_fingerprints",  # I  frame-fingerprint near-dup (r5c)
    "ml_kmeans_lloyd_exact",     # ML exact-trajectory Lloyd loop (r5c)
    "geo_grid_radius_join",      # GEO grid-bucketed spatial join (r5c)
    "ts_seasonality_strength_dft",  # TS single-bin DFT scoring (r5c)
    "er_weighted_linkage",       # ER weighted-evidence linkage (r5c)
    "embed_pq_codes_exact",      # I  pinned-codebook PQ encode (r6)
    "sim_knn_ivfpq_exact",       # I  exact-twin IVF-PQ composition (r6)
    "ml_rfm_segmentation_bucketed",  # ML window-free RFM scoring (r6)
    "stats_mannwhitney_u",       # STATS rank-sum U without ranks (r6)
    "multimodal_audio_downsample_2x",  # I  2x PCM decimation (r6)
    "vocab_bpe_pair_counts",     # I  BPE merge-step pair counts (r6)
    "stats_ks_two_sample_banded",    # STATS banded-prefix KS twin (r7)
    "win_cumulative_share_banded",   # E  banded Pareto ranker twin (r7)
    "ml_logreg_newton_exact",        # ML 3-step Newton IRLS loop (r7b)
    "ml_naive_bayes_langid",         # ML NB train+confusion matrix (r7b)
    "stats_spearman_rho",            # STATS banded rank-map Spearman (r8)
    "embed_matryoshka_recall",       # I  truncated-dim recall eval (r8)
    "text_gopher_quality_gate",      # I  rule-gate curation filter (r8)
    "graph_resource_allocation",     # GR RA link prediction (r8)
    "ml_dbscan_grid",                # ML grid DBSCAN + CC fixpoint (r8b)
    "sketch_count_min_exact",        # D13 pinned-hash CM twin (r8b)
    "pipeline_curation_accounting",  # I  gate→dedup→pack ledger (r8b)
    "multimodal_image_whash",        # I  WHT perceptual hash (r8b)
    "stats_bh_fdr",                  # STATS BH step-up over Welch family (r9)
    "graph_label_propagation",       # GR 3-round min-label Pregel (r9)
    "ml_target_encoding_kfold",      # ML out-of-fold target encoding (r9)
    "text_bleu_corpus_pairs",        # I  corpus BLEU-2 eval (r9)
    "ml_linreg_normal_eq",           # ML one-pass normal-equation OLS (r9)
    "agg_winsorized_mean",           # D  order-statistic winsorize (r9)
    "seq_markov_stationary",         # SEQ decimal-exact power iteration (r9)
    "stats_xi_correlation",          # STATS banded-seam Chatterjee xi (r9b)
    "ml_conformal_split_interval",   # ML split-conformal banded quantile (r9b)
    "graph_hits_hubs_authorities",   # GR bipartite HITS matvec (r9b)
    "sim_rrf_fusion",                # I  hybrid-ranking RRF fusion (r9b)
    "pipeline_rag_context_budget",   # I  retrieval + context packing (r9b)
    "er_fellegi_sunter_em",          # ER distributed EM M-step (r9b)
    "sketch_minhash_calibration",    # I  sketch-accuracy census (r10)
    "udtf_ngram_explode",            # K4 Arrow UDTF bigram exploder (r10)
    "udf_cogrouped_apply_in_arrow",  # K  two-sided Arrow cogroup census (r11)
    "scan_python_datasource",        # A  Python DataSource connector scan (r11)
    "scan_xml_source",               # A  native XML FileFormat census (r11)
    "win_lead_lag_rangesplit",       # E3 banded hot-partition window twin (r14)
    "sessionize_events_gap_rangesplit",  # TS banded sessionize twin (r15)
]

#: FROZEN round-over-round comparison cohort (VERDICT r10 item 5): the
#: exact 84-query matrix benched in round 8, never to be edited again.
#: The summary line emits `cohort_r8_sum` = sum of these queries' times,
#: so cross-round comparisons read one stable number instead of judges
#: re-deriving common subsets from the growing matrix.
COHORT_R8 = [
    "agg_grouping_sets", "agg_pricing_summary", "dedup_embedding_cosine",
    "dedup_exact_normalized", "dedup_frame_fingerprints",
    "dedup_minhash_incremental", "dedup_semantic_centroids",
    "dedup_simhash_exact", "dedup_substring_windows",
    "dedup_text_containment", "dedup_token_sort", "dedup_url_canonical",
    "dq_distribution_drift", "embed_matryoshka_recall",
    "embed_pq_codes_exact", "er_weighted_linkage", "geo_grid_radius_join",
    "graph_pagerank_fixed", "graph_reachability_paths",
    "graph_resource_allocation", "join_asof", "join_multiway_star",
    "market_basket_pairs", "ml_dbscan_grid", "ml_feature_hashing",
    "ml_kmeans_lloyd_exact", "ml_logreg_newton_exact",
    "ml_naive_bayes_langid", "ml_pca_power_component",
    "ml_rfm_segmentation_bucketed", "multimodal_audio_downsample_2x",
    "multimodal_frame_sample", "multimodal_image_whash",
    "path_topk_sessions", "pipeline_curation_accounting",
    "pipeline_dedup_cascade", "pipeline_training_data",
    "scan_dpp_partitioned", "sessionize_events_gap", "sim_knn_ivf_exact",
    "sim_knn_ivfpq", "sim_knn_ivfpq_exact", "sim_sparse_tfidf_pairs",
    "sim_topk_cosine_sql", "sketch_count_min_exact",
    "stats_ks_two_sample_banded", "stats_mannwhitney_u",
    "stats_poisson_bootstrap_ci", "stats_spearman_rho",
    "stream_session_gap_30m", "stream_tumbling_1h",
    "text_gopher_quality_gate", "text_tfidf_sql", "text_zipf_fit",
    "topk_global", "tpch_q10_returned_items", "tpch_q11_part_value",
    "tpch_q12_latency_classes", "tpch_q13_order_distribution",
    "tpch_q14_promo_share", "tpch_q15_top_supplier",
    "tpch_q16_supplier_counts", "tpch_q17_small_qty_revenue",
    "tpch_q18_large_orders", "tpch_q19_disjunctive_revenue",
    "tpch_q20_potential_promotion", "tpch_q21_waiting_supplier",
    "tpch_q22_dormant_customers", "tpch_q2_min_cost_supplier",
    "tpch_q4_priority_exists", "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping", "tpch_q8_market_share",
    "tpch_q9_profit_by_nation", "tpch_q9_profit_selective",
    "ts_hourly_gapfill", "ts_interpolate_linear", "ts_resample_ohlc",
    "ts_rolling_dau_wau", "ts_seasonality_strength_dft",
    "udf_pandas_scalar", "vocab_bpe_pair_counts",
    "win_cumulative_share_banded", "win_topk_per_group",
]

#: the adapted TPC-H suite (L1-L15 + the r4 selective Q9 twin) — benched
#: into the same parsed matrix so round-over-round regression tracking
#: covers it (VERDICT r3 item 5; PERF.md carried these only as prose).
TPCH = [
    "tpch_q4_priority_exists",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_profit_by_nation",
    "tpch_q9_profit_selective",
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
    "tpch_q2_min_cost_supplier",
    "tpch_q11_part_value",
    "tpch_q16_supplier_counts",
    "tpch_q20_potential_promotion",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
]


# plan normalization + hashing live in plans/audit.py so the emitter
# below and the cross-round shape gate (tests/test_plans.py) share ONE
# definition of "the plan changed" (VERDICT r13 item 1)
from etl_builder_spark.plans.audit import (  # noqa: E402
    plan_fine_hash,
    plan_shape_hash,
)


def emit_fingerprints() -> int:
    """``bench.py --fingerprints``: write PLAN_FINGERPRINTS.json mapping
    EVERY registry key to a stable hash of its normalized formatted
    physical plan (analysis + optimization only — nothing executes).
    The pre-execution plan is used deliberately: the post-AQE final
    plan folds in runtime statistics (partition coalescing counts vary
    with host state), which is exactly the noise this artifact exists
    to exclude."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    _ensure_loaded()
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("fingerprints", shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "8")))
    spark.sparkContext.setLogLevel("ERROR")

    def _hashes(name: str) -> tuple[str, str]:
        # canonical cache state (VERDICT r14 item 1): clear the cache
        # BEFORE building (fresh construction environment) and AGAIN
        # before explain.  Cache substitution happens at PLANNING time
        # via CacheManager lookup, so a frame built by a memoized
        # construction (e.g. the shared graph state) prints
        # InMemoryTableScan on a memo-miss build but the expanded
        # lineage on a memo-hit build — session history leaking into
        # the hash (ml_dbscan_grid / graph_degree_distribution, round
        # 14).  With the cache cleared at explain time, EVERY build
        # plans the same fully-expanded lineage.
        spark.catalog.clearCache()
        df = REGISTRY[name].fn(spark, sf_dir)
        spark.catalog.clearCache()
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        return plan_fine_hash(plan), plan_shape_hash(plan)

    fps: dict[str, str] = {}
    shapes: dict[str, str] = {}
    unstable: list[str] = []
    errs: dict[str, str] = {}
    for name in sorted(REGISTRY):
        try:
            fine1, shape1 = _hashes(name)
            fine2, shape2 = _hashes(name)
            if fine1 != fine2:
                unstable.append(name)
            if shape1 != shape2:
                errs[name] = "shape hash unstable within one session"
            fps[name] = min(fine1, fine2)  # deterministic representative
            shapes[name] = shape1
        except Exception as e:  # noqa: BLE001
            errs[name] = f"{type(e).__name__}: {str(e)[:160]}"
        print(f"# {name}: {fps.get(name, 'ERR')} {shapes.get(name, '')}", file=sys.stderr)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "PLAN_FINGERPRINTS.json")
    with open(out, "w") as f:
        json.dump(
            {
                "n_keys": len(fps),
                "n_errors": len(errs),
                "sf_dir": sf_dir,
                "errors": errs,
                # keys where Catalyst emits equivalent-but-reordered
                # expression lists run-to-run: compare their SHAPE hash
                "fine_unstable": sorted(unstable),
                "fingerprints": fps,
                "shapes": shapes,
            },
            f,
            indent=1,
            sort_keys=True,
        )
    print(json.dumps({"metric": "plan_fingerprints", "n_keys": len(fps), "n_errors": len(errs), "n_fine_unstable": len(unstable), "file": "PLAN_FINGERPRINTS.json"}))
    return 0


def main() -> int:
    if "--fingerprints" in sys.argv:
        return emit_fingerprints()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    _ensure_loaded()
    # 8 threads / 8 shuffle partitions for the local sub-GB bench: tasks
    # are tiny, so wider parallelism only adds contention (measured:
    # local[32] sweeps oscillate 24s→271s under sustained load;
    # local[8] holds 13-22s; session-window agg 3.8s @32-part → 0.6s
    # @8). On a cluster both are sized per job and AQE coalesces.
    # SPARK_GRAFT_CPUS / SPARK_GRAFT_SHUFFLE override.
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("bench", shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "8")))
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JIT, codegen cache, parquet footers
    REGISTRY["agg_pricing_summary"].fn(spark, sf_dir).collect()

    # host-speed calibration: min-of-3 of a fixed engine-independent
    # action (sum over range(100M) — pure codegen arithmetic, no I/O,
    # no shuffle).  This host's speed oscillates several-fold between
    # runs (NOTES_r1.md; measured 2026-08-13: the same query matrix
    # 9.1s one hour, 50.7s the next, with range-sum tracking the same
    # factor), so the calibration value lets round-over-round
    # comparisons separate engine regressions from host weather.
    def _calibrate() -> float:
        c = float("inf")
        for _ in range(3):
            t0 = time.time()
            spark.range(100_000_000).selectExpr("sum(id)").collect()
            c = min(c, time.time() - t0)
        return round(c, 4)

    cal = _calibrate()
    print(f"# calibration range-100M-sum: {cal:.3f}s", file=sys.stderr)

    # Second probe, SHUFFLE/I-O-shaped (round-10): the pure-codegen
    # range-sum tracks CPU speed only, and the r8→r9→r10 uniform matrix
    # drift (68.5→99.6→116s on overlapping query sets) happened at
    # NEAR-IDENTICAL range-sum values — whatever host resource moves the
    # matrix (memory bandwidth, page cache, disk path) is invisible to
    # it.  This probe reads lineitem off disk and hash-aggregates it
    # (scan + exchange + agg), min-of-3, so committed BENCH lines can
    # separate "engine got slower" from "host I/O got slower".
    def _calibrate_shuffle() -> float:
        c = float("inf")
        for _ in range(3):
            t0 = time.time()
            spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).groupBy(
                "l_suppkey"
            ).count().orderBy("l_suppkey").collect()
            c = min(c, time.time() - t0)
        return round(c, 4)

    cal_shuffle = _calibrate_shuffle()
    print(f"# calibration lineitem-shuffle: {cal_shuffle:.3f}s", file=sys.stderr)

    # min-of-3: this host oscillates under sustained wide-parallelism
    # load (NOTES_r1.md), so a single rep can catch a 3-10× stall.
    # The rep loop is OUTSIDE the query loop (round-robin passes): a
    # multi-minute host stall then inflates one pass across many
    # queries instead of all three reps of whichever query it lands
    # on, so the per-query min stays clean.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    times: dict[str, float] = {}
    rows: dict[str, int] = {}
    for _ in range(reps):
        for name in HEADLINE + TPCH:
            spec = REGISTRY[name]
            t0 = time.time()
            # Arrow-batched result delivery — the engine's fetch path
            # (row-pickling collect() is 2-10× slower at this row count)
            rows[name] = len(spec.fn(spark, sf_dir).toPandas())
            times[name] = round(min(times.get(name, float("inf")), time.time() - t0), 4)
    for name in HEADLINE + TPCH:
        print(f"# {name}: {times[name]:.3f}s ({rows[name]} rows)", file=sys.stderr)

    # The matrix leaves every query's .persist() frames in storage
    # (ADVICE r6: the PQ/stats keys never unpersist — by design, since a
    # lazy result can't unpersist its own inputs; accumulation is bounded
    # because DataFrame.persist() defaults to MEMORY_AND_DISK_DESER and
    # the CacheManager dedupes identical lineages across the 3 reps, so
    # total footprint is one matrix worth, spilling to disk under
    # pressure).  Drop it all here so the post-matrix calibration probe
    # measures the HOST, not storage pressure.
    spark.catalog.clearCache()

    # second calibration AFTER the matrix: a start-only probe can label
    # a run "calm" and then the host stalls mid-matrix (observed: start
    # 0.128 with a matrix ~8% slower than a 0.142-start run).  The pair
    # makes every committed JSON self-describing about mid-run drift —
    # read matrix times against max(start, end).
    cal_end = _calibrate()
    print(f"# calibration (post-matrix): {cal_end:.3f}s", file=sys.stderr)

    total = round(sum(times.values()), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    payload = {
        "metric": "headline_query_matrix_wall",
        "value": total,
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in times.items()},
        "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
        # extra key, ignored by strict readers: fixed-work host-speed
        # probe (sum over range(100M), min-of-3) for normalizing
        # cross-round comparisons on this oscillating host
        "calibration_range_sum_sec": cal,
        "calibration_shuffle_sec": cal_shuffle,
        "calibration_end_sec": cal_end,
        "n_queries": len(times),
        # the FROZEN 84-query round-8 cohort (see COHORT_R8): the one
        # number to compare round-over-round as the matrix grows.
        # cohort_r8_n guards against silent drift (ADVICE r11): a partial
        # bench run emits n < 84, so a smaller sum can't masquerade as
        # the frozen cohort.
        "cohort_r8_sum": round(sum(times[k] for k in COHORT_R8 if k in times), 2),
        "cohort_r8_n": sum(k in times for k in COHORT_R8),
        "detail_file": "BENCH_DETAIL.json",
    }

    # Full-precision per-query detail goes to a committed sidecar — the
    # driver's stdout capture keeps only the LAST ~2000 chars, and the r5
    # 62-query line was ~2.9 KB so the captured JSON never parsed
    # (BENCH_r05.json parsed: null; VERDICT r5 item 3).
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"), "w") as f:
        json.dump({**payload, "queries": times, "rows": rows}, f, indent=1)

    # The stdout line self-truncates to fit the capture window.  The
    # matrix grows every round and r6's margin was down to ~1 entry
    # (VERDICT r6 item 7), so the line now CAPS at the top-40 queries by
    # signal (HEADLINE order ranks them: BASELINE-numbered first, newer
    # adds later; TPC-H last) and the while-loop below only backstops.
    # Every query is always in the BENCH_DETAIL.json sidecar + stderr;
    # `value`/`n_queries` still cover the FULL matrix.
    budget = 1900
    stdout_cap = 40
    keep = list(times)[:stdout_cap]
    if len(keep) < len(times):
        payload["queries"] = {k: round(times[k], 2) for k in keep}
        payload["queries_omitted"] = len(times) - len(keep)
    while len(json.dumps(payload, separators=(",", ":"))) > budget and keep:
        keep.pop()
        payload["queries"] = {k: round(times[k], 2) for k in keep}
        payload["queries_omitted"] = len(times) - len(keep)
    print(json.dumps(payload, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    sys.exit(main())
