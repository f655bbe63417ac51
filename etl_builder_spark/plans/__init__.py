"""Pipeline plans: the fluent builder API and the declarative
dict/JSON pipeline spec → DataFrame compiler, plus plan introspection
helpers. This is the engine's 'ETL builder' surface — every pipeline
compiles to a single Catalyst logical plan, so the optimizer sees
through the whole chain (pushdown, pruning, join planning across
steps)."""

from etl_builder_spark.plans.pipeline import Pipeline, compile_spec  # noqa: F401
