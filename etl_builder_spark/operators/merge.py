"""MERGE / upsert emulation (classic ETL-builder operation).

No transactional table format ships in this sandbox (no Delta/Iceberg),
so MERGE is expressed as its relational core: FULL OUTER join of target
and updates on the key, then per-column precedence. This is exactly
what MERGE compiles to underneath; with Delta/Iceberg available the
same call maps onto their native MERGE INTO (which adds file-level
conflict handling, not different semantics).

100 TB posture: the join shuffles on the merge key once; with a
bucketed target (sources/writers.py) even that shuffle disappears for
the target side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_builder_spark.registry import register
from etl_builder_spark.session import load_table


def merge_upsert(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Upsert: update rows whose key matches, insert new keys, keep
    unmatched target rows. Updates take column precedence."""
    t = target.alias("t")
    u = updates.alias("u")
    cond = F.col(f"t.{key}") == F.col(f"u.{key}")
    cols = [
        F.coalesce(F.col(f"u.{c}"), F.col(f"t.{c}")).alias(c) for c in target.columns
    ]
    return t.join(u, cond, "full").select(*cols)


@register(
    "merge_upsert_orders",
    oracle="""
        WITH updates AS (
            SELECT o_orderkey, o_custkey, o_orderstatus,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2))
                        * CAST(1.10 AS DECIMAL(4,2)) AS DOUBLE) AS o_totalprice,
                   o_orderdate, o_orderpriority
            FROM orders WHERE o_orderkey % 10 = 0
            UNION ALL
            SELECT o_orderkey + 1000000, o_custkey, 'N',
                   o_totalprice, o_orderdate, '9-NEW'
            FROM orders WHERE o_orderkey % 100 = 0
        )
        SELECT COALESCE(u.o_orderkey, t.o_orderkey) AS o_orderkey,
               COALESCE(u.o_custkey, t.o_custkey) AS o_custkey,
               COALESCE(u.o_orderstatus, t.o_orderstatus) AS o_orderstatus,
               COALESCE(u.o_totalprice, t.o_totalprice) AS o_totalprice,
               COALESCE(u.o_orderdate, t.o_orderdate) AS o_orderdate,
               COALESCE(u.o_orderpriority, t.o_orderpriority) AS o_orderpriority
        FROM orders t FULL OUTER JOIN updates u ON t.o_orderkey = u.o_orderkey
    """,
    tags=("ETL-merge",),
)
def merge_upsert_orders(spark, sf_dir):
    """Upsert a derived updates set into orders: every 10th order gets
    a +10% exact-decimal price bump; every 100th key inserts as a new
    order. Output = the post-merge table state."""
    o = load_table(spark, sf_dir, "orders")
    bumped = o.where(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        (F.col("o_totalprice").cast("decimal(18,2)") * F.lit("1.10").cast("decimal(4,2)"))
        .cast("double")
        .alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )
    inserted = o.where(F.col("o_orderkey") % 100 == 0).select(
        (F.col("o_orderkey") + 1000000).alias("o_orderkey"),
        "o_custkey",
        F.lit("N").alias("o_orderstatus"),
        "o_totalprice",
        "o_orderdate",
        F.lit("9-NEW").alias("o_orderpriority"),
    )
    return merge_upsert(o, bumped.unionByName(inserted), "o_orderkey")
