"""Plan-shape golden checks (SURVEY.md §4.1): the optimizations the
engine relies on at 100 TB must actually appear in the physical plan —
pushdown, pruning, broadcast, top-k short-circuit, group-limit.
"""

from __future__ import annotations

from etl_builder_spark.registry import REGISTRY, _ensure_loaded
from tests.conftest import SF_DIR

_ensure_loaded()


def plan(spark, name: str) -> str:
    import contextlib
    import io

    df = REGISTRY[name].fn(spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_and_pruning(spark):
    p = plan(spark, "scan_parquet_pruned")
    assert "PushedFilters: [" in p
    assert "IsNotNull" in p or "GreaterThan" in p or "LessThan" in p
    # column pruning: scan schema carries only the 4 referenced columns
    read_schema = [ln for ln in p.splitlines() if "ReadSchema" in ln][0]
    assert "l_extendedprice" not in read_schema
    assert "l_quantity" in read_schema


def test_broadcast_join_is_broadcast(spark):
    p = plan(spark, "join_broadcast")
    assert "BroadcastHashJoin" in p


def test_star_join_broadcasts_dims(spark):
    p = plan(spark, "join_multiway_star")
    assert "BroadcastHashJoin" in p


def test_topk_plans_take_ordered(spark):
    p = plan(spark, "topk_global")
    assert "TakeOrderedAndProject" in p


def test_topk_per_group_has_group_limit(spark):
    p = plan(spark, "win_topk_per_group")
    assert "WindowGroupLimit" in p


def test_agg_has_partial_phase(spark):
    p = plan(spark, "agg_pricing_summary")
    # partial (map-side) + final HashAggregate around one key exchange
    assert p.count("HashAggregate") >= 2
    assert "Exchange" in p


def test_semi_anti_plan_as_joins(spark):
    assert "LeftSemi" in plan(spark, "join_semi")
    assert "LeftAnti" in plan(spark, "join_anti")
