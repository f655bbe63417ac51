"""Near-dup clustering: connected components over a candidate-pair
edge set (SURVEY.md §4.2 row 3 — the step after MinHash-LSH turns
pairwise matches into dedup groups).

Two formulations, same contract ((src,dst) edges → (node, component)
with component = min reachable node id):

* ``connected_components_min_label`` — iterative min-label
  propagation; O(diameter) rounds of one shuffle each. The right tool
  for near-dup graphs, whose components are short dup chains
  (diameter ≤ a few hops). Lineage is truncated with
  ``localCheckpoint`` every few rounds so hundred-round graphs don't
  accumulate an unbounded plan; non-convergence at ``max_iter``
  RAISES by default (silently returning partial labels was round-1
  behavior — a trap flagged in review).
* ``connected_components_star`` — the large-star/small-star
  alternation (Kiveris et al., "Connected Components in MapReduce and
  Beyond"): O(log² n) rounds regardless of diameter, the scale path
  for adversarial/high-diameter graphs (long chains, social graphs).
  Property-tested against union-find and against min-label.

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

# Truncate cached-plan lineage every N propagation rounds: iterated
# cache() chains grow the logical plan linearly and at real scale the
# driver spends more time re-analyzing the plan than running the round.
_CHECKPOINT_EVERY = 4


class NonConvergedError(RuntimeError):
    """Label propagation hit max_iter before reaching the fixpoint —
    the returned labels would NOT be true components."""


def connected_components_min_label(
    edges: DataFrame, max_iter: int = 15, on_nonconverged: str = "raise"
) -> DataFrame:
    """Min-label propagation to fixpoint.

    edges: (src, dst) long pairs, any orientation. Returns
    (node, component) where component = min node id reachable.

    Converges in O(component diameter) rounds; ``max_iter`` bounds the
    loop. If the bound is hit while labels are still changing the
    result is WRONG for the unconverged nodes, so the default is to
    raise ``NonConvergedError`` (pass ``on_nonconverged="warn"`` to
    get the partial labels anyway, e.g. for incremental runs). For
    graphs whose diameter you can't bound, use
    ``connected_components_star`` (O(log² n) rounds).
    """
    if on_nonconverged not in ("raise", "warn"):
        raise ValueError(f"on_nonconverged must be 'raise' or 'warn': {on_nonconverged!r}")
    sym = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    nodes = sym.select(F.col("src").alias("node")).distinct()
    labels = nodes.select("node", F.col("node").alias("label")).cache()
    labels.count()  # materialize
    converged = False
    for it in range(max_iter):
        neigh_min = (
            sym.join(labels, sym["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = labels.join(neigh_min, labels["node"] == neigh_min["src"], "left").select(
            "node",
            F.least(F.col("label"), F.coalesce("nlabel", F.col("label"))).alias("label"),
        )
        if (it + 1) % _CHECKPOINT_EVERY == 0:
            # eager truncation: cuts lineage AND materializes in one pass
            new_labels = new_labels.localCheckpoint(eager=True)
        else:
            new_labels = new_labels.cache()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        msg = (
            f"connected_components_min_label: still changing after {max_iter} rounds "
            f"(graph diameter > max_iter); labels are NOT components. "
            f"Raise max_iter or use connected_components_star."
        )
        if on_nonconverged == "raise":
            raise NonConvergedError(msg)
        import warnings

        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return labels.select("node", F.col("label").alias("component"))


def _large_star(sym: DataFrame) -> DataFrame:
    """For each node u: attach every strictly-larger neighbor to
    m = min(Γ(u) ∪ {u}). Emits (v, m) for v ∈ Γ(u), v > u."""
    m = sym.groupBy("src").agg(F.min("dst").alias("mn"))
    m = m.select("src", F.least("src", "mn").alias("m"))
    return (
        sym.where(F.col("dst") > F.col("src"))
        .join(m, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )


def _small_star(oriented: DataFrame) -> DataFrame:
    """Edges oriented (src > dst). For each src u: attach all
    smaller neighbors AND u itself to m = min(Γ(u))."""
    m = oriented.groupBy("src").agg(F.min("dst").alias("m"))
    to_nbrs = oriented.join(m, "src").select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    to_self = m.select("src", F.col("m").alias("dst"))
    return to_nbrs.union(to_self)


def connected_components_star(edges: DataFrame, max_iter: int = 50) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al.):
    alternate the two star contractions until the edge multiset is a
    fixed set of (node → root) star edges. O(log² n) rounds on ANY
    graph — no diameter dependence — so this is the 100 TB path for
    graphs where min-label's O(diameter) rounds would be unbounded.

    Returns (node, component), component = min node of the component.
    Each round is two shuffles (groupBy + join); the edge set is
    localCheckpoint'ed every few rounds to truncate lineage.
    """
    cur = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .select(
            F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
        )
        .distinct()
        .cache()
    )
    if cur.limit(1).count() == 0:
        return cur.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    prev_sig = None
    converged = False
    for it in range(max_iter):
        sym = cur.union(cur.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        after_large = _large_star(sym).where(F.col("src") != F.col("dst")).distinct()
        oriented = after_large.select(
            F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
        ).distinct()
        # checkpoint EVERY round: each round references `cur` several
        # times (sym twice, star joins), so without truncation the
        # logical plan multiplies per round and Catalyst analysis time
        # explodes long before the compute does
        new = _small_star(oriented).where(F.col("src") != F.col("dst")).distinct()
        new = new.localCheckpoint(eager=True)
        # one-pass fixpoint signature: count + order-free hash of the edge
        # set (XOR, not SUM: the edge set is distinct so XOR can't cancel,
        # and it can't overflow under ANSI mode)
        sig = new.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("src", "dst")).alias("h"),
        ).collect()[0]
        sig = (sig["n"], sig["h"])
        if it == 0:
            cur.unpersist()
        cur = new
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        raise NonConvergedError(
            f"connected_components_star: no fixpoint after {max_iter} rounds"
        )
    # fixpoint edges are (node, root) stars; roots label themselves
    members = cur.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    roots = cur.select(F.col("dst").alias("node"), F.col("dst").alias("component")).distinct()
    return members.union(roots).groupBy("node").agg(F.min("component").alias("component"))


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
