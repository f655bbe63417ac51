"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real surface lives in the ``etl_builder_spark`` package; this file
just re-exports the declared-query registry (etl_builder_spark/registry.py).
Every registered query was hash-verified locally via ``selfcheck.py``
before being declared here (SURVEY.md §2 rule).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_builder_spark import registry
from etl_builder_spark.operators.aggregates import agg_pricing_summary


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §2 D1, TPC-H Q1-shape pricing summary)
    on /root/testdata/sf0.001; driver checks rows>0."""
    return agg_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB ANSI-SQL twins for every exactly-checkable query;
    omitted keys (probabilistic/LSH ops) get the rows-only check."""
    return registry.oracle_sql()
