"""Declared-query registry — the engine's t2 contract surface.

Every operator from SURVEY.md §2 registers here as a ``QuerySpec``:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus, where the
semantics are exactly SQL-expressible, the equivalent DuckDB oracle SQL.
``__spark_entry__.py`` (the driver contract) re-exports this registry.

Rule (SURVEY.md §2): never register a query that hasn't been
hash-verified locally against DuckDB via ``selfcheck.py`` — declaring
is opting into being graded on it.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: SparkQuery
    oracle: str | None  # DuckDB ANSI SQL; None → driver's weaker rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: register a declared query under SURVEY §2 key ``name``."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query key: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tuple(tags))
        return fn

    return deco


def queries() -> dict[str, SparkQuery]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (import side effect)."""
    global _LOADED
    if _LOADED:
        return
    import etl_builder_spark.functions.scalar  # noqa: F401
    import etl_builder_spark.functions.sketches  # noqa: F401
    import etl_builder_spark.functions.udtf_ops  # noqa: F401
    import etl_builder_spark.llm.cluster  # noqa: F401
    import etl_builder_spark.llm.curation  # noqa: F401
    import etl_builder_spark.llm.dedup  # noqa: F401
    import etl_builder_spark.llm.embeddings  # noqa: F401
    import etl_builder_spark.llm.fingerprint  # noqa: F401
    import etl_builder_spark.llm.ivf  # noqa: F401
    import etl_builder_spark.llm.langid  # noqa: F401
    import etl_builder_spark.llm.multimodal  # noqa: F401
    import etl_builder_spark.llm.packing  # noqa: F401
    import etl_builder_spark.llm.sampling  # noqa: F401
    import etl_builder_spark.llm.similarity  # noqa: F401
    import etl_builder_spark.llm.text  # noqa: F401
    import etl_builder_spark.llm.training_pipeline  # noqa: F401
    import etl_builder_spark.operators.aggregates  # noqa: F401
    import etl_builder_spark.operators.asof  # noqa: F401
    import etl_builder_spark.operators.cdc  # noqa: F401
    import etl_builder_spark.operators.filters  # noqa: F401
    import etl_builder_spark.operators.funnel  # noqa: F401
    import etl_builder_spark.operators.histogram  # noqa: F401
    import etl_builder_spark.operators.joins  # noqa: F401
    import etl_builder_spark.operators.merge  # noqa: F401
    import etl_builder_spark.operators.scans  # noqa: F401
    import etl_builder_spark.operators.setops  # noqa: F401
    import etl_builder_spark.operators.sorts  # noqa: F401
    import etl_builder_spark.operators.subqueries  # noqa: F401
    import etl_builder_spark.operators.timeseries  # noqa: F401
    import etl_builder_spark.operators.window_frames  # noqa: F401
    import etl_builder_spark.operators.windows  # noqa: F401
    import etl_builder_spark.quality  # noqa: F401
    import etl_builder_spark.sources.roundtrip  # noqa: F401
    import etl_builder_spark.streaming.batch_twins  # noqa: F401
    import etl_builder_spark.udfs  # noqa: F401

    _LOADED = True
