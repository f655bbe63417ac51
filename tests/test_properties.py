"""Property-based tests (hypothesis): the library rewrites must equal
brute-force Python references on arbitrary small inputs — catching
edge semantics (ties, empties, singletons, hot keys) the corpus
fixtures never produce.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_builder_spark.llm.cluster import connected_components_min_label
from etl_builder_spark.operators.asof import asof_join
from etl_builder_spark.operators.skew import salted_join

BASE = datetime(2024, 1, 1)

_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

events = st.lists(
    st.tuples(
        st.integers(0, 3),  # user
        st.integers(0, 50),  # minutes offset
    ),
    min_size=0,
    max_size=12,
)


@given(left=events, right=events)
@_settings
def test_asof_matches_bruteforce(spark, left, right):
    ldf = spark.createDataFrame(
        [(u, BASE + timedelta(minutes=m), i) for i, (u, m) in enumerate(left)] or None,
        schema="user_id long, ts timestamp, lid long",
    ) if left else None
    if not left:
        return  # empty left: nothing to check
    rrows = [(u, BASE + timedelta(minutes=m), 100 + i) for i, (u, m) in enumerate(right)]
    # asof contract: right side unique per (key, ts) — dedupe keep max id
    dedup = {}
    for u, ts, rid in rrows:
        dedup[(u, ts)] = max(dedup.get((u, ts), -1), rid)
    rrows = [(u, ts, rid) for (u, ts), rid in dedup.items()]
    rdf = spark.createDataFrame(
        rrows or [(99, BASE, -1)], schema="user_id long, ts timestamp, rid long"
    )
    out = {
        r["lid"]: r["asof_rid"]
        for r in asof_join(ldf, rdf, "user_id", right_cols=("rid",)).collect()
    }
    # brute force: latest right at-or-before, same key
    expect = {}
    for i, (u, m) in enumerate(left):
        lts = BASE + timedelta(minutes=m)
        cands = [(ts, rid) for (ru, ts, rid) in rrows if ru == u and ts <= lts]
        expect[i] = max(cands)[1] if cands else None
    assert out == expect


pairs = st.lists(st.tuples(st.integers(0, 8), st.integers(0, 8)), min_size=1, max_size=15)


@given(edges=pairs)
@_settings
def test_connected_components_match_union_find(spark, edges):
    edf = spark.createDataFrame(edges, schema="src long, dst long")
    got = {
        r["node"]: r["component"]
        for r in connected_components_min_label(edf, max_iter=20).collect()
    }
    # union-find reference
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for s, d in edges:
        union(s, d)
    expect = {n: find(n) for n in parent}
    assert got == expect


facts = st.lists(st.tuples(st.integers(0, 2), st.integers(0, 100)), min_size=0, max_size=20)
dims = st.lists(st.integers(0, 4), min_size=0, max_size=5, unique=True)


@given(fact_rows=facts, dim_keys=dims)
@_settings
def test_salted_join_equals_plain_join(spark, fact_rows, dim_keys):
    if not fact_rows or not dim_keys:
        return
    fact = spark.createDataFrame(fact_rows, schema="k long, v long")
    dim = spark.createDataFrame([(k, f"d{k}") for k in dim_keys], schema="dk long, label string")
    plain = sorted(map(tuple, fact.join(dim, fact["k"] == dim["dk"]).collect()))
    salted = sorted(map(tuple, salted_join(fact, dim, "k", "dk", n_salts=4).collect()))
    assert salted == plain
