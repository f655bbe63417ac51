"""Engine facade — the single user-facing entry point.

    from etl_builder_spark.engine import Engine

    eng = Engine.local(sf_dir="/root/testdata/sf0.1")
    eng.table("lineitem").where(...)          # DataFrame entry
    eng.sql("SELECT ... FROM lineitem ...")   # SQL entry (shared catalog)
    eng.pipeline().scan("orders").filter(...) # fluent builder entry
    eng.run_spec({...})                       # declarative spec entry
    eng.stream_events(path)                   # streaming entry

All five entries compose the same lazy DataFrames over one catalog, so
they interoperate (a SQL view can feed a pipeline and vice versa) and
every Catalyst optimization spans entry-point boundaries.
"""

from __future__ import annotations

from collections.abc import Mapping
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from etl_builder_spark.plans.pipeline import Pipeline, compile_spec
from etl_builder_spark.session import TABLES, get_spark, load_table, register_views


class Engine:
    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir
        register_views(spark, sf_dir)

    @classmethod
    def local(cls, sf_dir: str, app_name: str = "etl_builder_spark") -> "Engine":
        return cls(get_spark(app_name), sf_dir)

    # -- entry points ----------------------------------------------
    def table(self, name: str) -> DataFrame:
        if name not in TABLES:
            raise KeyError(f"unknown table {name!r}; catalog: {sorted(TABLES)}")
        return load_table(self.spark, self.sf_dir, name)

    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)

    def pipeline(self) -> Pipeline:
        return Pipeline(self.spark, self.sf_dir)

    def run_spec(self, spec: Mapping[str, Any]) -> DataFrame:
        return compile_spec(self.spark, self.sf_dir, spec)

    def stream_events(self, path: str, **kwargs) -> DataFrame:
        from etl_builder_spark.streaming.runtime import stream_events

        return stream_events(self.spark, path, **kwargs)

    # -- declared-query surface ------------------------------------
    def query(self, key: str) -> DataFrame:
        """Run a declared query from the registry by key."""
        from etl_builder_spark.registry import REGISTRY, _ensure_loaded

        _ensure_loaded()
        if key not in REGISTRY:
            raise KeyError(f"unknown query {key!r}")
        return REGISTRY[key].fn(self.spark, self.sf_dir)
