#!/usr/bin/env python
"""One-shot helper: materialize the ×10 ten-table corpus (sf1.0-
equivalent) used by the round-12 full-registry scale parity sweep.

Thin driver around ``scale_stress.synth_dir`` so the sweep command is
reproducible:  python tools_x10_synth.py && \
    python selfcheck.py --sf /tmp/etl_builder_spark_scale/x10 --json ...
"""
import os

from pyspark.sql import SparkSession

from scale_stress import synth_dir

spark = (
    SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .appName("x10_synth")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
out = synth_dir(spark, "/root/testdata/sf0.1", 10)
print(out)
spark.stop()
