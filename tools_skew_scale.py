#!/usr/bin/env python
"""Skew-at-scale synthesis (round 13): remap the ×10 corpus's FK
columns so the hot keys own real data volumes — one order owning ~90%
of 6M line items, one user ~99% of 100k events, one customer ~90% of
150k orders.  The 40-row ``skewed`` shape proves parity under skew;
this proves the same plans SURVIVE skew at millions of rows — the
single-partition-window / hot-shuffle-key hazard the 100 TB posture
actually fears.

Deterministic remap (no randomness): a row is HOT iff its original
key % 10 != 0, so ~90% of rows collapse onto the first key of the
referenced table; the remaining rows keep their original (valid) key.
``l_linenumber`` is re-sequenced per order via a row_number window so
(l_orderkey, l_linenumber) stays unique — the windows this costs are
exactly the skew surface the exercise exists to measure.

Usage: python tools_skew_scale.py [--scale {10,100}]
       # writes <SYNTH_ROOT>/x10_skewed (default) or x100_skewed
Then:  python selfcheck.py --sf /tmp/etl_builder_spark_scale/x10_skewed \
           --only <skew cohort> --json CORRECTNESS_LOCAL_r13_x10_skewed_cohort.json
"""

from __future__ import annotations

import argparse
import os
import shutil

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from scale_stress import SYNTH_ROOT


def main() -> int:
    ap = argparse.ArgumentParser()
    # round 14 (VERDICT r13 item 2): the same remap at ×100 — one user
    # owning ~99% of 10M events is the hot-window partition the
    # range-split escape hatch exists for
    ap.add_argument("--scale", type=int, default=10, choices=(10, 100))
    args = ap.parse_args()
    SRC = os.path.join(SYNTH_ROOT, f"x{args.scale}")
    OUT = os.path.join(SYNTH_ROOT, f"x{args.scale}_skewed")
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .appName("x10_skew_synth")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)

    # dimension tables and payload tables pass through unchanged
    for t in ("region", "nation", "customer", "supplier", "part",
              "documents", "embeddings"):
        src = os.path.join(SRC, f"{t}.parquet")
        dst = os.path.join(OUT, f"{t}.parquet")
        if os.path.isdir(src):
            shutil.copytree(src, dst, dirs_exist_ok=True)
        else:
            shutil.copy(src, dst)

    # orders: one customer owns ~90%
    o = spark.read.parquet(os.path.join(SRC, "orders.parquet"))
    hot_cust = o.select(F.min("o_custkey")).first()[0]
    o.withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % 10 != 0, F.lit(hot_cust)).otherwise(
            F.col("o_custkey")
        ),
    ).write.mode("overwrite").parquet(os.path.join(OUT, "orders.parquet"))

    # lineitem: one order owns ~90% of 6M rows; linenumber re-sequenced
    li = spark.read.parquet(os.path.join(SRC, "lineitem.parquet"))
    hot_order = li.select(F.min("l_orderkey")).first()[0]
    li = li.withColumn(
        "l_orderkey",
        F.when(F.col("l_orderkey") % 10 != 0, F.lit(hot_order)).otherwise(
            F.col("l_orderkey")
        ),
    )
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_shipdate", "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity",
        "l_linenumber",
    )
    li.withColumn("l_linenumber", F.row_number().over(w).cast("int")).write.mode(
        "overwrite"
    ).parquet(os.path.join(OUT, "lineitem.parquet"))

    # events: one user owns ~99%
    e = spark.read.parquet(os.path.join(SRC, "events.parquet"))
    hot_user = e.select(F.min("user_id")).first()[0]
    e.withColumn(
        "user_id",
        F.when(F.col("event_id") % 100 != 0, F.lit(hot_user)).otherwise(
            F.col("user_id")
        ),
    ).write.mode("overwrite").parquet(os.path.join(OUT, "events.parquet"))

    print(OUT)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
