"""Unit tests for the as-of join rewrite (SURVEY §4.2, §7.3.2):
edge semantics that the corpus-level oracle check can't isolate —
exact-timestamp matches, no-match nulls, duplicate left timestamps.
"""

from __future__ import annotations

from datetime import datetime

from etl_builder_spark.operators.asof import asof_join


def _df(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def test_asof_basic_and_exact_match(spark):
    left = _df(
        spark,
        [
            (1, datetime(2024, 1, 1, 10, 0), "p1"),
            (1, datetime(2024, 1, 1, 12, 0), "p2"),
        ],
        ["user_id", "ts", "pid"],
    )
    right = _df(
        spark,
        [
            (1, datetime(2024, 1, 1, 9, 0), 100),
            (1, datetime(2024, 1, 1, 12, 0), 200),  # exact-equal ts → matches p2
        ],
        ["user_id", "ts", "rid"],
    )
    out = {r["pid"]: r["asof_rid"] for r in asof_join(left, right, "user_id", right_cols=("rid",)).collect()}
    assert out == {"p1": 100, "p2": 200}


def test_asof_no_match_is_null(spark):
    left = _df(spark, [(1, datetime(2024, 1, 1, 8, 0), "early")], ["user_id", "ts", "pid"])
    right = _df(spark, [(1, datetime(2024, 1, 1, 9, 0), 100)], ["user_id", "ts", "rid"])
    rows = asof_join(left, right, "user_id", right_cols=("rid",)).collect()
    assert len(rows) == 1 and rows[0]["asof_rid"] is None


def test_asof_duplicate_left_ts_same_match(spark):
    left = _df(
        spark,
        [(1, datetime(2024, 1, 1, 10, 0), "a"), (1, datetime(2024, 1, 1, 10, 0), "b")],
        ["user_id", "ts", "pid"],
    )
    right = _df(spark, [(1, datetime(2024, 1, 1, 9, 30), 7)], ["user_id", "ts", "rid"])
    out = {r["pid"]: r["asof_rid"] for r in asof_join(left, right, "user_id", right_cols=("rid",)).collect()}
    assert out == {"a": 7, "b": 7}


def test_asof_keys_do_not_cross(spark):
    left = _df(spark, [(2, datetime(2024, 1, 1, 10, 0), "other")], ["user_id", "ts", "pid"])
    right = _df(spark, [(1, datetime(2024, 1, 1, 9, 0), 100)], ["user_id", "ts", "rid"])
    rows = asof_join(left, right, "user_id", right_cols=("rid",)).collect()
    assert rows[0]["asof_rid"] is None
