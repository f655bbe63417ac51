"""K-family UDF contracts beyond the registry matrix: loud failure
modes that the oracle comparison can't see."""

from __future__ import annotations

import pytest

from etl_builder_spark.udfs import cents_mean, group_count


def test_cents_mean_rejects_sub_cent_inputs(spark):
    """A 3-dp value must fail loudly, not silently truncate to cents."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import PythonException

    df = spark.createDataFrame(
        [(1, 10.005), (1, 20.115)], "grp int, value double"
    )
    with pytest.raises((PythonException, Py4JJavaError), match="2 decimal places"):
        df.groupBy("grp").agg(cents_mean("value").alias("m")).collect()


def test_cents_mean_exact_on_2dp(spark):
    df = spark.createDataFrame(
        [(1, 0.1), (1, 0.3)], "grp int, value double"
    )
    out = df.groupBy("grp").agg(
        cents_mean("value").alias("m"), group_count("value").alias("n")
    ).collect()[0]
    # int64-cents accumulation: (10+30)/100/2 == 0.2 exactly,
    # where a naive float sum gives 0.30000000000000004 + ...
    assert out["m"] == 0.2
    assert out["n"] == 2


def test_observe_metrics_collect_pipeline_counters(spark):
    """df.observe(): named aggregate metrics piggyback on a real action
    with ZERO extra passes — the in-query counter surface an ETL
    runner uses for row-count reconciliation without re-scanning.
    Verify the observed metrics equal independently computed values."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from etl_builder_spark.session import load_table
    from tests.conftest import SF_DIR

    o = load_table(spark, SF_DIR, "orders")
    obs = Observation("ingest_audit")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("o_totalprice") > 200000, 1)).alias("n_big"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
    )
    kept = observed.where(F.col("o_orderstatus") == "O").count()
    got = obs.get
    expect_n = o.count()
    expect_big = o.where(F.col("o_totalprice") > 200000).count()
    assert got["n_rows"] == expect_n
    assert got["n_big"] == expect_big
    assert got["total"] > 0
    assert kept <= expect_n
