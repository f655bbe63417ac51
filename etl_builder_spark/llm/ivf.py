"""IVF-style approximate nearest neighbor (the third ANN strategy next
to brute force I6 and random-projection LSH I7):

1. Train a coarse quantizer (seeded k-means) over the corpus.
2. Assign every vector to its nearest centroid (the inverted list).
3. At query time, probe only the `n_probe` closest centroids' lists —
   the classic IVF recall/cost dial.

100 TB posture: centroids are tiny and broadcast; assignment is one
scan; a probe touches n_probe/k of the corpus. The inverted lists are
just a `cluster_id` column — partition/bucket by it and a probe prunes
partitions instead of scanning them.

Everything stays in DataFrames: ml.KMeans for training (seeded,
deterministic), expression-only distance math for assignment and
search (no per-row Python).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from etl_builder_spark.llm.similarity import _dbl, dot
from etl_builder_spark.registry import register
from etl_builder_spark.session import load_table


def _sq_dist(a: Column, b: Column) -> Column:
    diff = F.zip_with(a, b, lambda x, y: x - y)
    return F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x * x)


def train_quantizer(vectors: DataFrame, vec_col: str = "v", k: int = 16, seed: int = 42) -> DataFrame:
    """Seeded k-means centroids as a small DataFrame (cluster_id, cv)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    feat = vectors.select(array_to_vector(F.col(vec_col)).alias("features"))
    km = KMeans(k=k, seed=seed, maxIter=20, featuresCol="features")
    model = km.fit(feat)
    centers = model.clusterCenters()
    spark = vectors.sparkSession
    return spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centers)], ["cluster_id", "cv"]
    )


def assign_clusters(vectors: DataFrame, centroids: DataFrame, vec_col: str = "v") -> DataFrame:
    """Nearest-centroid assignment via broadcast cross join + argmin —
    expression-only, one scan of the corpus."""
    d2 = _sq_dist(F.col(vec_col), F.col("cv"))
    w = Window.partitionBy("vec_id").orderBy(F.round(d2, 9).asc(), F.col("cluster_id"))
    return (
        vectors.crossJoin(F.broadcast(centroids))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn", "cv")
    )


def ivf_topk(
    indexed: DataFrame,
    centroids: DataFrame,
    probes: DataFrame,
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """Search: per probe, rank centroids by distance, keep n_probe
    lists, brute-force only inside them."""
    pc = probes.crossJoin(F.broadcast(centroids))
    w = Window.partitionBy("probe_id").orderBy(
        F.round(_sq_dist(F.col("pv"), F.col("cv")), 9).asc(), F.col("cluster_id")
    )
    probe_lists = (
        pc.withColumn("crn", F.row_number().over(w)).where(F.col("crn") <= n_probe)
        .select("probe_id", "pv", "cluster_id")
    )
    cands = probe_lists.join(indexed, "cluster_id").where(F.col("vec_id") != F.col("probe_id"))
    sim = F.round(
        dot(F.col("pv"), F.col("v"))
        / (F.sqrt(dot(F.col("pv"), F.col("pv"))) * F.sqrt(dot(F.col("v"), F.col("v")))),
        6,
    )
    wk = Window.partitionBy("probe_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (
        cands.select("probe_id", "vec_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(wk))
        .where(F.col("rank") <= k)
    )


def write_ivf_index(indexed: DataFrame, path: str) -> None:
    """Materialize the inverted lists as a ``cluster_id``-partitioned
    parquet layout: each IVF list becomes a physical partition
    directory, so a probe that filters on cluster_id prunes whole
    directories at planning time instead of scanning them.  This is the
    on-disk form of the 'inverted list = cluster_id column' posture in
    the module docstring."""
    indexed.write.mode("overwrite").partitionBy("cluster_id").parquet(path)


def probe_pruned_lists(spark, path: str, cluster_ids: list[int]) -> DataFrame:
    """Read ONLY the probed lists from a written IVF index.  The isin
    filter on the partition column becomes a PartitionFilter in the
    scan — verified by a plan-shape test — so I/O is n_probe/k of the
    index regardless of corpus size."""
    return spark.read.parquet(path).where(F.col("cluster_id").isin(cluster_ids))


@register(
    "sim_knn_ivf",
    oracle=None,  # k-means cluster boundaries are engine-specific → rows-only
    tags=("I7-ivf",),
)
def sim_knn_ivf(spark, sf_dir):
    """IVF top-10 for 5 probes (k=16 lists, 4 probed). Deterministic
    given the seed; rows-only by construction."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", _dbl().alias("v"))
    centroids = train_quantizer(e, k=16, seed=42)
    indexed = assign_clusters(e, centroids)
    probes = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), F.col("v").alias("pv")
    )
    return ivf_topk(indexed, centroids, probes, k=10, n_probe=4)
