#!/usr/bin/env python
"""Round-15 optimization profiler (guide §1): for each named registry
key, capture the formatted physical plan to plans/r15/<key>_<tag>.txt
and time the computation with the noop sink (§1.4) — build time
(construction-executing keys run jobs during build) and noop-write
time reported separately, min of N reps each.

Usage:
    python tools_profile_queries.py --tag before --keys k1,k2,...
    python tools_profile_queries.py --tag after  --keys ...
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 8),
     SPARK_GRAFT_SHUFFLE (default 8) — same defaults as bench.py.
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
    ap.add_argument("--tag", default="before")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--no-plans", action="store_true")
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    _ensure_loaded()
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark(
        "profile", shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "8"))
    )
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)

    # warm-up: JIT + parquet footers (same as bench.py)
    REGISTRY["agg_pricing_summary"].fn(spark, sf_dir).collect()

    results = {}
    for name in args.keys.split(","):
        spec = REGISTRY[name]
        build_s, noop_s = float("inf"), float("inf")
        plan = None
        for _ in range(args.reps):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"profile:{name}:build")
            t0 = time.time()
            df = spec.fn(spark, sf_dir)
            build_s = min(build_s, time.time() - t0)
            if plan is None and not args.no_plans:
                plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                    df._jdf.queryExecution(), "formatted"
                )
            spark.sparkContext.setJobDescription(f"profile:{name}:noop")
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            noop_s = min(noop_s, time.time() - t0)
            spark.sparkContext.setJobDescription(None)
        if plan is not None:
            with open(os.path.join(out_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(plan)
        results[name] = {"build_s": round(build_s, 3), "noop_s": round(noop_s, 3)}
        print(f"# {name}: build {build_s:.3f}s  noop {noop_s:.3f}s", flush=True)
    print(json.dumps({"tag": args.tag, "sf_dir": sf_dir, "results": results}))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
