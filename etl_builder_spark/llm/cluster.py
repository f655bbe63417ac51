"""Near-dup clustering: connected components over a candidate-pair
edge set via min-label propagation (SURVEY.md §4.2 row 3 — the step
after MinHash-LSH turns pairwise matches into dedup groups).

Implementation: iterative DataFrame label propagation — each round,
every node takes the min label among itself and its neighbors; stop at
fixpoint (bounded iterations, convergence checked per round). Rounds
are plain shuffles, so the algorithm is cluster-parallel; at true
100 TB scale swap in the large-star/small-star formulation (fewer
rounds on high-diameter graphs) — the corpus near-dup graph is
low-diameter (dup chains), where plain propagation converges in
O(chain length) rounds.

The declared query proves the iterative algorithm against a
DECLARATIVE oracle: planted two-hop dup chains (id ↔ id+10000 ↔
id+20000) have the closed-form component `id % 10000`, which plain SQL
can state — an independent check that label propagation actually
reaches the transitive closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_builder_spark.registry import register
from etl_builder_spark.session import load_table

PLANT = 10000


def connected_components_min_label(edges: DataFrame, max_iter: int = 15) -> DataFrame:
    """Min-label propagation to fixpoint.

    edges: (src, dst) long pairs, any orientation. Returns
    (node, component) where component = min node id reachable.
    """
    sym = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    nodes = sym.select(F.col("src").alias("node")).distinct()
    labels = nodes.select("node", F.col("node").alias("label")).cache()
    labels.count()  # materialize
    for _ in range(max_iter):
        neigh_min = (
            sym.join(labels, sym["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neigh_min, labels["node"] == neigh_min["src"], "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nlabel", F.col("label"))).alias("label"),
            )
            .cache()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component"))


@register(
    "dedup_cluster_components",
    oracle=f"""
        WITH nodes AS (
            SELECT doc_id FROM documents
            UNION ALL SELECT doc_id + {PLANT} FROM documents
            UNION ALL SELECT doc_id + {2 * PLANT} FROM documents
        )
        SELECT doc_id AS node, doc_id % {PLANT} AS component FROM nodes
    """,
    tags=("I-cluster",),
)
def dedup_cluster_components(spark, sf_dir):
    """Cluster planted two-hop dup chains: edges (id, id+10000) and
    (id+10000, id+20000) — the base id is linked to id+20000 only
    transitively, so the fixpoint component is id for all three tiers."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    e1 = d.select(F.col("doc_id").alias("src"), (F.col("doc_id") + PLANT).alias("dst"))
    e2 = d.select(
        (F.col("doc_id") + PLANT).alias("src"), (F.col("doc_id") + 2 * PLANT).alias("dst")
    )
    return connected_components_min_label(e1.union(e2))
