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
