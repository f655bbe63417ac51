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


#: geohash parameters: 20 bits per axis -> 40 bits -> 8 base32 chars
GH_BITS = 20
GH_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _gh_interleave(lon_e: str, lat_e: str, shift_op: str) -> str:
    """Fixed 40-term bit-interleave expression (lon on even bit
    positions from the MSB, per the geohash spec).  ``shift_op``
    selects engine syntax: DuckDB infix shifts vs Spark shiftleft()."""
    terms = []
    for k in range(GH_BITS):
        if shift_op == "infix":
            terms.append(f"((({lon_e} >> {k}) & 1) << {2 * k + 1})")
            terms.append(f"((({lat_e} >> {k}) & 1) << {2 * k})")
        else:
            terms.append(f"shiftleft(shiftright({lon_e}, {k}) & 1, {2 * k + 1})")
            terms.append(f"shiftleft(shiftright({lat_e}, {k}) & 1, {2 * k})")
    return " + ".join(terms)


def _gh_chars(code_e: str) -> str:
    """8 base32 chars from the 40-bit code, MSB first (engine-neutral:
    substr/concat/% behave identically on non-negative ints)."""
    parts = [
        f"substr('{GH_BASE32}', CAST((({code_e}) >> {35 - 5 * c}) % 32 AS INT) + 1, 1)"
        for c in range(8)
    ]
    return "concat(" + ", ".join(parts) + ")"


def _gh_chars_spark(code_e: str) -> str:
    parts = [
        f"substr('{GH_BASE32}', CAST(shiftright({code_e}, {35 - 5 * c}) % 32 AS INT) + 1, 1)"
        for c in range(8)
    ]
    return "concat(" + ", ".join(parts) + ")"


@register(
    "geo_geohash_encode",
    oracle=f"""
        WITH pts AS (
            SELECT DISTINCT user_id,
                   user_id * 37 % 18000 AS klat,
                   user_id * 91 % 36000 AS klon
            FROM events
        ),
        q AS (
            SELECT user_id,
                   CAST(klat AS DOUBLE) / 100 - 90 AS lat,
                   CAST(klon AS DOUBLE) / 100 - 180 AS lon,
                   klat * 1048576 // 18000 AS ilat,
                   klon * 1048576 // 36000 AS ilon
            FROM pts
        ),
        enc AS (
            SELECT user_id, lat, lon,
                   {_gh_interleave('ilon', 'ilat', 'infix')} AS code
            FROM q
        )
        SELECT user_id, lat, lon,
               CAST(code AS BIGINT) AS gh_code,
               {_gh_chars('code')} AS geohash8,
               substr({_gh_chars('code')}, 1, 4) AS geohash4
        FROM enc
    """,
    tags=("GEO-geohash",),
)
def geo_geohash_encode(spark, sf_dir):
    """Geohash encoding as PURE INTEGER expressions: quantize each
    axis to {GH_BITS} bits with the exact integer identity
    k·2^{GH_BITS} div range (the synthetic coordinates are integer
    hundredths, so no float touches the quantizer), interleave with a
    fixed 40-term shift-and-mask expression (lon on even bit
    positions from the MSB, per the geohash spec), and map 5-bit
    groups through the standard base32 alphabet.  Geohash prefixes
    ARE the spatial bucketing key geo_grid_radius_join builds ad hoc
    — shared cell prefixes = spatial locality.

    100 TB posture: fully expression-side (whole-stage codegen, zero
    UDFs, zero shuffles beyond the distinct); the encoder is the
    standard layout key for spatial bucketing/Z-ordering of a lake
    table — etl_zorder_interleave's machinery with the geodetic
    quantizer in front.  Ref: public geohash spec (Niemeyer);
    the bit layout is property-tested against a pure-Python encoder."""
    e = load_table(spark, sf_dir, "events")
    pts = e.select(
        "user_id",
        (F.col("user_id") * 37 % 18000).alias("klat"),
        (F.col("user_id") * 91 % 36000).alias("klon"),
    ).distinct()
    q = pts.select(
        "user_id",
        (F.col("klat").cast("double") / 100 - 90).alias("lat"),
        (F.col("klon").cast("double") / 100 - 180).alias("lon"),
        F.expr("klat * 1048576 div 18000").alias("ilat"),
        F.expr("klon * 1048576 div 36000").alias("ilon"),
    )
    enc = q.select(
        "user_id",
        "lat",
        "lon",
        F.expr(_gh_interleave("ilon", "ilat", "fn")).alias("code"),
    )
    return enc.select(
        "user_id",
        "lat",
        "lon",
        F.col("code").cast("bigint").alias("gh_code"),
        F.expr(_gh_chars_spark("code")).alias("geohash8"),
        F.expr(f"substr({_gh_chars_spark('code')}, 1, 4)").alias("geohash4"),
    )
