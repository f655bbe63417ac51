#!/usr/bin/env python
"""Round-15 subset bench: EXACTLY bench.py's per-query methodology
(one session, one warm-up action, reps round-robin, min-of-N,
toPandas() fetch, no cache clearing) over a named key subset — for
fast before/after comparisons while optimizing.  The committed
BENCH numbers still come from the full bench.py run.

Usage: python tools_bench_subset.py --keys k1,k2,... [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import time

from etl_builder_spark.registry import REGISTRY, _ensure_loaded
from etl_builder_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", required=True)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    _ensure_loaded()
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark(
        "bench-subset", shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "8"))
    )
    spark.sparkContext.setLogLevel("ERROR")
    REGISTRY["agg_pricing_summary"].fn(spark, sf_dir).collect()  # warm-up
    keys = args.keys.split(",")
    times: dict[str, float] = {}
    for _ in range(args.reps):
        for name in keys:
            t0 = time.time()
            REGISTRY[name].fn(spark, sf_dir).toPandas()
            times[name] = round(min(times.get(name, float("inf")), time.time() - t0), 4)
    for name in keys:
        print(f"# {name}: {times[name]:.3f}s", flush=True)
    print(json.dumps({"sf_dir": sf_dir, "times": times}))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
