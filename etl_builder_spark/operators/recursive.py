"""Recursive CTE / iterative graph traversal (Spark 4 `WITH
RECURSIVE`, verified working in this sandbox on 4.1.2).

Recursion is the one relational construct the rest of the repo works
around (connected components in llm/cluster.py iterates DataFrames
driver-side to a fixpoint); Spark 4's recursive CTEs move that loop
INTO Catalyst — each step is planned like any other join/filter, with
the engine handling termination.  At scale each recursion step is a
distributed self-join on the frontier, so depth × frontier-size is
the cost model — right for hierarchy walks (org charts, BOM
explosions, folder trees) whose depth is tens, not millions.

The corpus has no native edge table, so the declared key derives a
deterministic binary-tree hierarchy from customer ids (parent(n) =
floor((n-1)/2), ids 1..126 → a 7-level tree rooted at 0) and walks
every node to the root, accumulating the ancestor path — the classic
transitive-closure shape, hash-checked against DuckDB's WITH
RECURSIVE.
"""

from __future__ import annotations

import os

from etl_builder_spark.registry import register

_WALK = """
WITH RECURSIVE walk(node, anc, depth, path) AS (
    SELECT c_custkey, c_custkey, 0, CAST(c_custkey AS {str_t})
    FROM {customer} WHERE c_custkey BETWEEN 1 AND 126
    UNION ALL
    SELECT node, CAST(FLOOR((anc - 1) / 2.0) AS BIGINT), depth + 1,
           path || '>' || CAST(CAST(FLOOR((anc - 1) / 2.0) AS BIGINT) AS {str_t})
    FROM walk WHERE anc > 0
)
SELECT node, MAX(depth) AS depth_to_root,
       MAX(CASE WHEN anc = 0 THEN path END) AS root_path
FROM walk GROUP BY node
"""


@register(
    "graph_reachability_paths",
    oracle=_WALK.format(str_t="VARCHAR", customer="customer"),
    tags=("graph-recursive",),
)
def graph_reachability_paths(spark, sf_dir):
    """Transitive closure via a REAL recursive CTE: walk every node of
    the derived customer binary tree to its root, reporting depth and
    the full ancestor path string.  Same SQL text in both engines up
    to the STRING/VARCHAR spelling; integer division is spelled
    FLOOR(x / 2.0) because small-int float division is exact in
    IEEE double on both sides."""
    path = os.path.join(sf_dir, "customer.parquet")
    return spark.sql(_WALK.format(str_t="STRING", customer=f"parquet.`{path}`"))
