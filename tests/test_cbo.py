"""CBO / ANALYZE TABLE statistics (SURVEY.md §4.1 cap → tested).

At 100 TB the optimizer can't see data it hasn't scanned: without
table/column statistics a filtered fact joins as sort-merge because
its size estimate is the full file size.  ANALYZE TABLE ... FOR ALL
COLUMNS persists rowCount + per-column min/max/NDV into the catalog;
with spark.sql.cbo.enabled the filter estimation shrinks the join
input by the predicate's selectivity and the planner broadcasts the
now-tiny side instead.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture()
def cbo_tables(spark, tmp_path):
    spark.sql(f"CREATE DATABASE IF NOT EXISTS cbo_db LOCATION '{tmp_path}/cbo_db'")
    spark.read.parquet(f"{SF_DIR}/orders.parquet").write.mode("overwrite").saveAsTable(
        "cbo_db.orders_m"
    )
    spark.read.parquet(f"{SF_DIR}/customer.parquet").write.mode("overwrite").saveAsTable(
        "cbo_db.customer_m"
    )
    yield
    spark.sql("DROP DATABASE cbo_db CASCADE")


def _probe(spark):
    """(sizeInBytes, rowCount|None, planned-BHJ, planned-SMJ) for a
    selective-filter join under the current conf/stats state."""
    o = spark.table("cbo_db.orders_m").where(F.col("o_custkey") == 7)
    c = spark.table("cbo_db.customer_m")
    df = o.join(c, c.c_custkey == o.o_custkey).select("c_name", "o_totalprice")
    qe = df._jdf.queryExecution()
    stats = qe.optimizedPlan().stats()
    init = qe.executedPlan().toString()
    rc = stats.rowCount()
    return (
        int(stats.sizeInBytes()),
        int(rc.get()) if not rc.isEmpty() else None,
        "BroadcastHashJoin" in init,
        "SortMergeJoin" in init,
    )


def test_analyze_column_stats_flip_join_to_broadcast(spark, cbo_tables):
    # below BOTH file sizes (customer.parquet is ~7KB at sf0.001), above
    # the post-stats estimate of the o_custkey=7 slice (a few hundred B)
    threshold = 2 * 1024
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": str(threshold),
        "spark.sql.cbo.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        size0, rows0, bhj0, smj0 = _probe(spark)
        # file-size estimate, no row count, join too big to broadcast
        assert rows0 is None and smj0 and not bhj0
        assert size0 > threshold

        spark.sql("ANALYZE TABLE cbo_db.orders_m COMPUTE STATISTICS FOR ALL COLUMNS")
        spark.sql("ANALYZE TABLE cbo_db.customer_m COMPUTE STATISTICS FOR ALL COLUMNS")
        # the catalog now carries min/max/NDV per column
        det = {
            r["info_name"]: r["info_value"]
            for r in spark.sql("DESC EXTENDED cbo_db.orders_m o_custkey").collect()
        }
        assert det["min"] is not None and int(det["distinct_count"]) > 0

        spark.conf.set("spark.sql.cbo.enabled", "true")
        size1, rows1, bhj1, smj1 = _probe(spark)
        # NDV-based equality selectivity: ~n_orders/NDV rows, a few KB —
        # small enough that the planner now broadcasts
        assert rows1 is not None and rows1 < 1000
        assert size1 < threshold < size0
        assert bhj1 and not smj1
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v) if v is not None else spark.conf.unset(k)
