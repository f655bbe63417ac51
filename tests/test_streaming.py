"""Streaming smokes (SURVEY.md §2 J-rows): the real readStream
pipelines execute end-to-end with memory sinks, and their final state
matches the deterministic batch twins where semantics allow.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from etl_builder_spark.session import load_table
from etl_builder_spark.streaming import runtime
from tests.conftest import SF_DIR

EVENTS = os.path.join(SF_DIR, "events.parquet")


def test_tumbling_stream_matches_batch(spark):
    """J1: streaming tumbling counts (complete mode, full replay) ==
    batch groupBy over the same data."""
    ev = runtime.stream_events(spark, EVENTS)
    out = runtime.run_to_memory(runtime.tumbling_counts(ev, watermark="100 days"), "complete")
    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "event_type", "n")
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, batch.collect()))


def test_session_stream_runs(spark):
    ev = runtime.stream_events(spark, EVENTS)
    out = runtime.run_to_memory(runtime.session_counts(ev), "complete")
    n_events = out.agg(F.sum("n_events")).collect()[0][0]
    assert n_events == 1000  # every event lands in exactly one session


def test_dedup_within_watermark(spark, tmp_path):
    """J5: a replayed duplicate file is fully deduplicated by event_id."""
    dup_dir = tmp_path / "dup_events"
    dup_dir.mkdir()
    t = pq.read_table(EVENTS)
    pq.write_table(t, dup_dir / "a.parquet")
    pq.write_table(t, dup_dir / "b.parquet")
    ev = runtime.stream_events(spark, str(dup_dir))
    out = runtime.run_to_memory(runtime.dedup_within_watermark(ev), "append")
    assert out.count() == t.num_rows


def test_stream_static_join(spark):
    ev = runtime.stream_events(spark, EVENTS)
    cust = load_table(spark, SF_DIR, "customer")
    out = runtime.run_to_memory(runtime.stream_static_join(ev, cust), "append")
    assert out.count() == 1000
    assert out.where(F.col("c_mktsegment").isNull()).count() == 0


def test_stateful_user_counters(spark):
    """J6: applyInPandasWithState running counters — final counter per
    user equals the batch per-user count."""
    ev = runtime.stream_events(spark, EVENTS)
    out = runtime.run_to_memory(runtime.running_user_counters(ev), "update")
    # update mode emits one row per user per batch; last value wins
    final = out.groupBy("user_id").agg(F.max("n_events").alias("n"))
    batch = load_table(spark, SF_DIR, "events").groupBy("user_id").count()
    got = {r["user_id"]: r["n"] for r in final.collect()}
    want = {r["user_id"]: r["count"] for r in batch.collect()}
    assert got == want


def test_late_data_dropped_by_watermark(spark, tmp_path):
    """J4: with maxFilesPerTrigger=1, a second file far older than the
    advanced watermark is dropped from the append-mode windowed agg."""
    d = tmp_path / "late_events"
    d.mkdir()
    t = pq.read_table(EVENTS)
    # first batch: the newest half; second batch: the oldest half (late)
    import pyarrow.compute as pc

    order = pc.sort_indices(t.column("ts"))
    half = t.num_rows // 2
    newest = t.take(order.slice(half))
    oldest = t.take(order.slice(0, half))
    pq.write_table(newest, d / "batch_1_new.parquet")
    ev = runtime.stream_events(spark, str(d), max_files_per_trigger=1)
    agg = runtime.tumbling_counts(ev, watermark="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("late_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    # replay the old half late, resuming from the same checkpoint
    pq.write_table(oldest, d / "batch_2_old.parquet")
    ev2 = runtime.stream_events(spark, str(d), max_files_per_trigger=1)
    agg2 = runtime.tumbling_counts(ev2, watermark="1 hour")
    q2 = (
        agg2.writeStream.format("memory")
        .queryName("late_test2")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q2.awaitTermination(120)
    emitted = spark.table("late_test2").agg(F.sum("n")).collect()[0][0] or 0
    # the late (oldest) half is behind the watermark → contributes nothing
    assert emitted <= half
