"""Round-10 operator tests: reference-implementation checks for the
new keys (VERDICT r9 item 5) — a plain-Python recomputation pins each
result so cross-engine parity can't hide a shared wrong formula."""

from __future__ import annotations

import duckdb

from etl_builder_spark.registry import REGISTRY, _ensure_loaded
from tests.conftest import SF_DIR

_ensure_loaded()


def test_udtf_ngram_explode_matches_python_bigrams(spark):
    """The UDTF's (doc_id, pos, bigram) rows must equal the literal
    Python definition — enumerate adjacent token pairs of split(' ')
    with 1-based positions — for every doc in the declared frame."""
    rows = REGISTRY["udtf_ngram_explode"].fn(spark, SF_DIR).collect()
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet') "
        "WHERE doc_id < 50"
    ).fetchall()
    assert docs, "fixture must contain docs below the frame bound"
    want = []
    for doc_id, text in docs:
        toks = text.split(" ")
        for i in range(len(toks) - 1):
            want.append((doc_id, i + 1, toks[i] + " " + toks[i + 1]))
    assert sorted(r[:3] for r in [(g[0], g[1], g[2]) for g in rows]) == sorted(want)
    # every doc with >= 2 tokens expands to len-1 rows (row-expanding seam)
    n_expected = sum(max(len(t.split(" ")) - 1, 0) for _, t in docs)
    assert len(rows) == n_expected


def test_udtf_ngram_explode_is_arrow_not_batcheval(spark):
    """The UDTF must cross the Python boundary as Arrow batches —
    BatchEvalPython is banned repo-wide (plan sweep invariant)."""
    plan = (
        REGISTRY["udtf_ngram_explode"]
        .fn(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "PythonUDTF" in plan


def test_stream_static_join_live_equals_batch_join(spark):
    """The availableNow replay of the stream-static join must emit
    exactly the batch join's row set — each event enriched once."""
    from etl_builder_spark.session import load_table

    out = REGISTRY["stream_static_join_live"].fn(spark, SF_DIR).collect()
    got = sorted(
        (r["event_id"], r["ts"], r["user_id"], r["c_mktsegment"], r["value"])
        for r in out
    )
    ev = load_table(spark, SF_DIR, "events")
    cust = load_table(spark, SF_DIR, "customer")
    batch = (
        ev.join(cust, ev["user_id"] == cust["c_custkey"])
        .select("event_id", "ts", "user_id", "c_mktsegment", "value")
        .collect()
    )
    want = sorted(
        (r["event_id"], r["ts"], r["user_id"], r["c_mktsegment"], r["value"])
        for r in batch
    )
    assert got == want
    # exactly-once per event: event_ids unique in the replayed output
    ids = [r["event_id"] for r in out]
    assert len(ids) == len(set(ids))
