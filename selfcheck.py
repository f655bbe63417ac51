#!/usr/bin/env python
"""Local replica of the driver's t2 correctness gate (SURVEY.md §5.2).

Runs every declared query's PySpark implementation and its DuckDB
oracle side-by-side and compares row count, column names, and exact
(order-insensitive) values — STRICTER than the driver's value-hash:
any reasonable hash of values that pass here passes there.

Usage:
    python selfcheck.py                       # sf0.01, all queries
    python selfcheck.py --sf /root/testdata/sf0.001
    python selfcheck.py --only agg_pricing_summary,join_asof
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from datetime import date, datetime
from decimal import Decimal

import duckdb

from etl_builder_spark.registry import REGISTRY, _ensure_loaded
from etl_builder_spark.session import TABLES, get_spark


def canon(v) -> str:
    """Canonicalize a cell value to a comparable string."""
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return "0.0"  # normalize -0.0
        return repr(v)
    if isinstance(v, Decimal):
        return canon(float(v))
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def rows_to_canonical(col_names, rows) -> list[tuple[str, ...]]:
    order = sorted(range(len(col_names)), key=lambda i: col_names[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def check_query(spark, con, name, spec, sf_dir) -> tuple[str, str, float]:
    t0 = time.time()
    try:
        sdf = spec.fn(spark, sf_dir)
        scols = list(sdf.columns)
        srows = sdf.collect()
    except Exception as e:  # noqa: BLE001
        return "SPARK-ERROR", f"{type(e).__name__}: {str(e)[:400]}", time.time() - t0
    if spec.oracle is None:
        return "ROWS-ONLY", f"{len(srows)} rows", time.time() - t0
    try:
        cur = con.execute(spec.oracle)
        ocols = [d[0] for d in cur.description]
        orows = cur.fetchall()
    except Exception as e:  # noqa: BLE001
        return "ORACLE-ERROR", f"{type(e).__name__}: {str(e)[:400]}", time.time() - t0
    if sorted(scols) != sorted(ocols):
        return "SCHEMA-MISMATCH", f"spark={sorted(scols)} oracle={sorted(ocols)}", time.time() - t0
    if len(srows) != len(orows):
        return "COUNT-MISMATCH", f"spark={len(srows)} oracle={len(orows)}", time.time() - t0
    s_canon = rows_to_canonical(scols, srows)
    o_canon = rows_to_canonical(ocols, orows)
    if s_canon != o_canon:
        diffs = [(s, o) for s, o in zip(s_canon, o_canon) if s != o]
        example = diffs[0] if diffs else ("<set-level>", "<set-level>")
        return (
            "VALUE-MISMATCH",
            f"{len(diffs)}/{len(srows)} rows differ; first: spark={example[0]} oracle={example[1]}",
            time.time() - t0,
        )
    return "OK", f"{len(srows)} rows", time.time() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    _ensure_loaded()
    specs = dict(REGISTRY)
    if args.only:
        keys = args.only.split(",")
        missing = [k for k in keys if k not in specs]
        if missing:
            print(f"unknown keys: {missing}")
            return 2
        specs = {k: specs[k] for k in keys}

    spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')")

    n_bad = 0
    for name, spec in specs.items():
        status, detail, dt = check_query(spark, con, name, spec, args.sf)
        ok = status in ("OK", "ROWS-ONLY")
        n_bad += 0 if ok else 1
        print(f"{'✓' if ok else '✗'} {name:32s} {status:16s} {dt:6.2f}s  {detail}")
    print(f"\n{len(specs) - n_bad}/{len(specs)} green")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
