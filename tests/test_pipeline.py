"""Pipeline builder: fluent chain ≡ declarative spec ≡ hand-written
DataFrame, and the compiled chain stays one optimizable Catalyst plan
(filter pushes through later steps to the scan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_builder_spark.plans import Pipeline, compile_spec
from etl_builder_spark.session import load_table
from tests.conftest import SF_DIR

SPEC = {
    "source": "lineitem",
    "ops": [
        {"op": "filter", "expr": "l_quantity > 10"},
        {"op": "derive", "cols": {"net": "l_extendedprice * (1 - l_discount)"}},
        {"op": "agg", "by": ["l_returnflag"], "aggs": {"total_net": "sum(net)", "n": "count(*)"}},
        {"op": "sort", "by": ["total_net desc", "l_returnflag"], "limit": 2},
    ],
}


def _expected(spark):
    l = load_table(spark, SF_DIR, "lineitem").where(F.col("l_quantity") > 10)
    return (
        l.withColumn("net", F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .groupBy("l_returnflag")
        .agg(F.sum("net").alias("total_net"), F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("total_net").desc(), "l_returnflag")
        .limit(2)
    )


def test_fluent_matches_handwritten(spark):
    got = (
        Pipeline(spark, SF_DIR)
        .scan("lineitem")
        .filter("l_quantity > 10")
        .derive(net="l_extendedprice * (1 - l_discount)")
        .agg(by=["l_returnflag"], total_net="sum(net)", n="count(*)")
        .sort("total_net desc", "l_returnflag")
        .limit(2)
        .frame()
    )
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in _expected(spark).collect()]


def test_spec_matches_fluent(spark):
    got = compile_spec(spark, SF_DIR, SPEC)
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in _expected(spark).collect()]


def test_spec_join_broadcast_and_window(spark):
    spec = {
        "source": "orders",
        "ops": [
            {"op": "join", "table": "customer", "on": "o_custkey = c_custkey", "broadcast": True},
            {
                "op": "window",
                "partition_by": ["c_mktsegment"],
                "order_by": ["o_totalprice DESC", "o_orderkey"],
                "cols": {"rn": "row_number()"},
            },
            {"op": "filter", "expr": "rn <= 3"},
            {"op": "select", "cols": ["c_mktsegment", "o_orderkey", "o_totalprice", "rn"]},
        ],
    }
    out = compile_spec(spark, SF_DIR, spec)
    rows = out.collect()
    assert len(rows) == 5 * 3  # 5 segments × top-3
    assert all(r["rn"] <= 3 for r in rows)


def test_pipeline_is_one_catalyst_plan(spark):
    """A filter added AFTER derive/select still reaches the parquet scan
    — proof the builder adds no optimization barrier."""
    p = (
        Pipeline(spark, SF_DIR)
        .scan("lineitem")
        .derive(net="l_extendedprice * (1 - l_discount)")
        .select("l_orderkey", "net", "l_quantity")
        .filter("l_quantity > 45")
    )
    plan = p.explain_text()
    assert "PushedFilters" in plan and "GreaterThan" in plan


def test_unknown_op_fails_loudly(spark):
    import pytest

    with pytest.raises(ValueError, match="unknown pipeline op"):
        compile_spec(spark, SF_DIR, {"source": "orders", "ops": [{"op": "zap"}]})
