"""Skew-aware joins (SURVEY.md §4.3): AQE's skew-join split handles
most cases at runtime; explicit salting is the escape hatch when one
key dominates so heavily that even split partitions bottleneck (e.g. a
null-ish sentinel key holding 30% of a 100 TB fact table).

Salted join: fact rows get a random salt in [0, n); the dim side is
exploded n× (one copy per salt value); join on (key, salt). The dim
explosion is n× a SMALL table — cheap — while the fact side's hot key
now spreads over n reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_builder_spark.registry import register


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join fact⋈dim on an equi key with salt-spread reducers.

    Results are identical to the plain join (salt is internal and
    dropped); only the shuffle layout changes. The fact salt uses a
    deterministic hash of a uniformifying column combination rather
    than rand() so the operator stays reproducible.
    """
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(*fact.columns), F.lit(n_salts)).cast("int")
    )
    salts = F.explode(F.array(*[F.lit(i) for i in range(n_salts)])).alias("__salt")
    salted_dim = dim.select("*", salts)
    joined = salted_fact.join(
        salted_dim,
        (salted_fact[fact_key] == salted_dim[dim_key]) & (salted_fact["__salt"] == salted_dim["__salt"]),
        how,
    )
    return joined.drop("__salt")


@register(
    "join_skew_salted",
    oracle="""
        SELECT o_orderpriority,
               COUNT(*) AS n_items,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                   AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
    """,
    tags=("C-skew",),
)
def join_skew_salted(spark, sf_dir):
    """The salted fact⋈dim join as a DECLARED, hash-checked surface:
    revenue per order priority through ``salted_join`` (8 salts), with
    the PLAIN join as the oracle — proving end-to-end that salting is
    pure shuffle re-layout with zero value drift.

    This is the manual escape hatch for the skew AQE can't save: a
    single key holding a double-digit percent of a 100 TB fact table
    bottlenecks even a split partition, while the salt spreads it over
    n_salts reducers at the cost of exploding the SMALL side n_salts×
    (still broadcast-size).  The salt is a deterministic hash of the
    fact row (no rand()), so the operator is reproducible run-to-run.
    Equality with the plain join is ALSO property-tested on a
    deliberately skewed frame (tests/test_properties.py::
    test_salted_join_equals_plain_join)."""
    from etl_builder_spark.policy import money
    from etl_builder_spark.session import load_table

    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    joined = salted_join(l, o, "l_orderkey", "o_orderkey", n_salts=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(money("l_extendedprice") * (F.lit(1) - money("l_discount")))
        .cast("double")
        .alias("revenue"),
    )
