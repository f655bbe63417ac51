"""Plan auditing — the engine's own 100 TB lint pass.

`plan_digest` summarizes a DataFrame's executed plan into the counts
that matter at scale: real FileScans per source (cache-description
reprints excluded), exchanges, sorts, cached-frame reuses, and the
presence of the two forbidden node types.  `assert_scan_budget` turns
the digest into a guard an operator (or test) can pin its plan with.

Motivation (PERF.md round-5 persist sweep): lazy evaluation
RE-DERIVES any DataFrame referenced more than once — a dedup
cascade's executed plan held 88 document scans before its invariants
were persisted.  The digest makes that class of regression visible
in one call, and tests/test_plans.py uses it to pin the repaired
plans (e.g. dq_null_profile at exactly one scan).
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import DataFrame

#: node names that must never appear in a declared plan (the same
#: contract tests/test_plans.py sweeps registry-wide)
FORBIDDEN_NODES = ("CartesianProduct", "BatchEvalPython")


def _formatted(df: DataFrame) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_digest(df: DataFrame) -> dict:
    """Summarize the executed plan.  Scan counts come from the
    FORMATTED explain's numbered node headers (``(n) Scan parquet``),
    which appear once per REAL scan node — the plain ``toString``
    form re-prints a cached relation's entire child plan inside every
    InMemoryTableScan, inflating naive path-mention counts (the trap
    the round-5 audit tooling hit first)."""
    p = _formatted(df)
    scans = re.findall(r"\(\d+\) Scan parquet[^\n]*\n(?:[^\n]*\n)*?Location[^\n]*?\[([^\]]*)\]", p)
    per_source = Counter(loc.rstrip("/").split("/")[-1] for loc in scans)
    return {
        "scans": dict(per_source),
        "n_scans": sum(per_source.values()),
        "n_exchanges": len(re.findall(r"\(\d+\) Exchange", p)),
        "n_sorts": len(re.findall(r"\(\d+\) Sort\b", p)),
        "n_cached_reads": len(re.findall(r"\(\d+\) InMemoryTableScan", p)),
        "forbidden": [n for n in FORBIDDEN_NODES if n in p],
    }


def assert_scan_budget(df: DataFrame, max_scans_per_source: int = 1) -> dict:
    """Raise if any single source is scanned more than the budget, or
    a forbidden node appears.  Returns the digest for further checks."""
    d = plan_digest(df)
    over = {s: n for s, n in d["scans"].items() if n > max_scans_per_source}
    if over:
        raise AssertionError(
            f"scan budget exceeded (>{max_scans_per_source} per source): {over}"
        )
    if d["forbidden"]:
        raise AssertionError(f"forbidden plan nodes: {d['forbidden']}")
    return d
