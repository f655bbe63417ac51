"""Spatial radius join via grid bucketing — the geohash/S2-style
candidate generation every location join at scale uses: bucket both
sides into fixed cells of size = the search radius, equi-join each
point's cell against the 3×3 neighborhood of the other side's cells,
then verify exact distance.  With cell size ≥ radius, a matching pair
can never sit more than one cell apart on either axis, so the
neighborhood join is PROVABLY complete — and the declared oracle is
the brute-force cross-join distance filter, so hash equality IS the
completeness proof, every round, on real data.

The corpus carries no coordinates, so both engines derive synthetic
ones from keys by exact integer arithmetic (id·k mod 1000, scaled a
decimal digit) — deterministic, identical, and irrelevant to the
operator's shape.

100 TB posture: the grid join is one equi-join on (cell_x, cell_y) —
candidates bounded by per-cell density (city-center hot cells are
ordinary join skew: AQE split or cell salting), never the |A|·|B|
cross product the oracle runs at fixture scale.  Here the POI side is
small and broadcast, exploded ×9 into its neighbor cells (the
classic broadcast-the-small-side-with-replication trick); with two
large sides, both shuffle on the cell key instead.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_builder_spark.registry import register
from etl_builder_spark.session import load_table

#: search radius and grid cell size (cell ≥ radius ⇒ ±1 neighborhood
#: join is complete)
GEO_RADIUS = 5.0
GEO_CELL = 5.0


@register(
    "geo_grid_radius_join",
    oracle=f"""
        WITH pts AS (
            SELECT DISTINCT user_id,
                   CAST(user_id * 37 % 1000 AS DOUBLE) / 10.0 AS x,
                   CAST(user_id * 91 % 1000 AS DOUBLE) / 10.0 AS y
            FROM events
        ),
        pois AS (
            SELECT s_suppkey AS poi_id,
                   CAST(s_suppkey * 53 % 1000 AS DOUBLE) / 10.0 AS px,
                   CAST(s_suppkey * 29 % 1000 AS DOUBLE) / 10.0 AS py
            FROM supplier
        )
        SELECT user_id, poi_id,
               ROUND(sqrt((x - px) * (x - px) + (y - py) * (y - py)), 6) AS dist
        FROM pts CROSS JOIN pois
        WHERE (x - px) * (x - px) + (y - py) * (y - py)
              <= {GEO_RADIUS} * {GEO_RADIUS}
    """,
    tags=("GEO-radius",),
)
def geo_grid_radius_join(spark, sf_dir):
    """All (point, POI) pairs within radius {GEO_RADIUS}: grid-bucketed
    candidate join + exact verify (see module docstring; the oracle is
    the brute-force join, so the hash check proves the grid loses no
    pair)."""
    e = load_table(spark, sf_dir, "events")
    s = load_table(spark, sf_dir, "supplier")
    pts = e.select("user_id").distinct().select(
        "user_id",
        ((F.col("user_id") * 37 % 1000).cast("double") / 10.0).alias("x"),
        ((F.col("user_id") * 91 % 1000).cast("double") / 10.0).alias("y"),
    )
    pois = s.select(
        F.col("s_suppkey").alias("poi_id"),
        ((F.col("s_suppkey") * 53 % 1000).cast("double") / 10.0).alias("px"),
        ((F.col("s_suppkey") * 29 % 1000).cast("double") / 10.0).alias("py"),
    )
    cell = lambda c: F.floor(c / F.lit(GEO_CELL)).cast("long")  # noqa: E731
    pts_c = pts.select("user_id", "x", "y", cell(F.col("x")).alias("cx"), cell(F.col("y")).alias("cy"))
    off = F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
    pois_n = (
        pois.select("poi_id", "px", "py", cell(F.col("px")).alias("pcx"), cell(F.col("py")).alias("pcy"))
        .select("poi_id", "px", "py", "pcx", "pcy", off.alias("dx"))
        .select("poi_id", "px", "py", (F.col("pcx") + F.col("dx")).alias("cx"), "pcy", off.alias("dy"))
        .select("poi_id", "px", "py", "cx", (F.col("pcy") + F.col("dy")).alias("cy"))
    )
    d2 = (F.col("x") - F.col("px")) * (F.col("x") - F.col("px")) + (
        F.col("y") - F.col("py")
    ) * (F.col("y") - F.col("py"))
    return (
        pts_c.join(F.broadcast(pois_n), ["cx", "cy"])
        .where(d2 <= F.lit(GEO_RADIUS * GEO_RADIUS))
        .select("user_id", "poi_id", F.round(F.sqrt(d2), 6).alias("dist"))
    )


@register(
    "geo_nearest_poi_grid",
    oracle=f"""
        WITH pts AS (
            SELECT DISTINCT user_id,
                   CAST(user_id * 37 % 1000 AS DOUBLE) / 10.0 AS x,
                   CAST(user_id * 91 % 1000 AS DOUBLE) / 10.0 AS y
            FROM events
        ),
        pois AS (
            SELECT s_suppkey AS poi_id,
                   CAST(s_suppkey * 53 % 1000 AS DOUBLE) / 10.0 AS px,
                   CAST(s_suppkey * 29 % 1000 AS DOUBLE) / 10.0 AS py
            FROM supplier
        ),
        cand AS (
            SELECT user_id, poi_id,
                   ROUND(sqrt((x - px) * (x - px) + (y - py) * (y - py)), 6) AS dist
            FROM pts CROSS JOIN pois
            WHERE (x - px) * (x - px) + (y - py) * (y - py)
                  <= {GEO_RADIUS} * {GEO_RADIUS}
        )
        SELECT user_id, poi_id AS nearest_poi, dist
        FROM (
            SELECT user_id, poi_id, dist,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY dist, poi_id) AS r
            FROM cand
        ) WHERE r = 1
    """,
    tags=("GEO-nn",),
)
def geo_nearest_poi_grid(spark, sf_dir):
    """Nearest POI within radius {GEO_RADIUS} per point — the
    grid-bucketed argmin on top of the radius join's candidate set
    (nearest-WITHIN-RADIUS keeps the ±1-cell neighborhood provably
    complete; unbounded nearest-neighbor would need expanding-ring
    probes).  Distances rank on the 6-dp rounded value with a poi_id
    tiebreak (policy §7.2); the argmin is a per-point window over the
    few candidates the grid admits — bounded frames, same completeness
    oracle as geo_grid_radius_join (brute-force cross join)."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    s = load_table(spark, sf_dir, "supplier")
    pts = e.select("user_id").distinct().select(
        "user_id",
        ((F.col("user_id") * 37 % 1000).cast("double") / 10.0).alias("x"),
        ((F.col("user_id") * 91 % 1000).cast("double") / 10.0).alias("y"),
    )
    pois = s.select(
        F.col("s_suppkey").alias("poi_id"),
        ((F.col("s_suppkey") * 53 % 1000).cast("double") / 10.0).alias("px"),
        ((F.col("s_suppkey") * 29 % 1000).cast("double") / 10.0).alias("py"),
    )
    cell = lambda c: F.floor(c / F.lit(GEO_CELL)).cast("long")  # noqa: E731
    pts_c = pts.select(
        "user_id", "x", "y", cell(F.col("x")).alias("cx"), cell(F.col("y")).alias("cy")
    )
    off = F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
    pois_n = (
        pois.select("poi_id", "px", "py", cell(F.col("px")).alias("pcx"), cell(F.col("py")).alias("pcy"))
        .select("poi_id", "px", "py", "pcx", "pcy", off.alias("dx"))
        .select("poi_id", "px", "py", (F.col("pcx") + F.col("dx")).alias("cx"), "pcy", off.alias("dy"))
        .select("poi_id", "px", "py", "cx", (F.col("pcy") + F.col("dy")).alias("cy"))
    )
    d2 = (F.col("x") - F.col("px")) * (F.col("x") - F.col("px")) + (
        F.col("y") - F.col("py")
    ) * (F.col("y") - F.col("py"))
    cand = (
        pts_c.join(F.broadcast(pois_n), ["cx", "cy"])
        .where(d2 <= F.lit(GEO_RADIUS * GEO_RADIUS))
        .select("user_id", "poi_id", F.round(F.sqrt(d2), 6).alias("dist"))
    )
    w = Window.partitionBy("user_id").orderBy("dist", "poi_id")
    return (
        cand.select("*", F.row_number().over(w).alias("r"))
        .where(F.col("r") == 1)
        .select("user_id", F.col("poi_id").alias("nearest_poi"), "dist")
    )
