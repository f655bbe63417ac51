"""Focused pins for the round-15 optimization-round internals.

Each test pins the EQUIVALENCE argument an optimization rests on, not
just the end-to-end value (the parity suite already covers those):

- the bounded-levenshtein contract (`_lev_pinned(..., threshold=2)`):
  exact distance in 0..2, -1 above the bound, NULL for non-ASCII —
  and the gate translations (`d <= 2` ⇔ `d >= 0`, CLOSE tier `d > 0`)
  agree with the unbounded form on every class of operand;
- the two-stage trigram shingling: the Generate reads the token ARRAY
  COLUMN instead of re-inlining filter(split(lower(text))) per
  element_at (the round's biggest per-task-work fix), and the rows
  are identical to the inlined form.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_builder_spark.operators.fuzzy import _lev_pinned


def _pairs(spark):
    rows = [
        ("abc", "abc"),        # d=0
        ("abc", "abd"),        # d=1
        ("abcdef", "abdcef"),  # d=2 (transposition = 2 edits)
        ("kitten", "sitting"), # d=3 -> bounded -1
        ("x", "xyzw"),         # d=3 via length gap -> bounded -1
        ("café", "cafe"),      # non-ASCII -> NULL both forms
        ("", ""),              # d=0 empty
        ("", "ab"),            # d=2
        ("", "abc"),           # d=3 -> bounded -1
    ]
    return spark.createDataFrame(rows, "a string, b string")


def test_bounded_lev_contract(spark):
    df = _pairs(spark).select(
        _lev_pinned(F.col("a"), F.col("b")).alias("full"),
        _lev_pinned(F.col("a"), F.col("b"), threshold=2).alias("capped"),
    )
    for r in df.collect():
        if r.full is None:
            # non-ASCII: both forms pin to NULL
            assert r.capped is None
        elif r.full <= 2:
            # inside the bound the banded DP is exact
            assert r.capped == r.full
        else:
            # above the bound the sentinel is -1, never a distance
            assert r.capped == -1


def test_bounded_lev_gate_translations(spark):
    """`d <= 2` on the unbounded form ⇔ `d >= 0` on the bounded form,
    and the CLOSE tier (`0 < d <= 2`) ⇔ `d > 0` — including the NULL
    (non-ASCII) rows, which must fail every gate on both forms."""
    df = _pairs(spark).select(
        (_lev_pinned(F.col("a"), F.col("b")) <= 2).alias("le2_full"),
        (_lev_pinned(F.col("a"), F.col("b"), threshold=2) >= 0).alias("le2_capped"),
        (
            (_lev_pinned(F.col("a"), F.col("b")) > 0)
            & (_lev_pinned(F.col("a"), F.col("b")) <= 2)
        ).alias("close_full"),
        (_lev_pinned(F.col("a"), F.col("b"), threshold=2) > 0).alias("close_capped"),
    )
    for r in df.collect():
        # three-valued logic collapses to the same TRUE set: coalesce
        # NULL -> False the way every WHEN/WHERE consumer does
        assert bool(r.le2_full) == bool(r.le2_capped)
        assert bool(r.close_full) == bool(r.close_capped)


def test_trigram_generate_reads_column_not_inlined_split(spark):
    """The shingle Generate must take the token array from a COLUMN:
    the inlined form re-ran filter(split(lower(text))) once per
    trigram per element_at (measured 10x on the shingle pass).  Pin:
    at most 2 split( occurrences survive in the whole physical plan
    (scan-side filter + the one projection), and the value rows are
    identical to the reference inlined form."""
    from etl_builder_spark.llm.sparse_sim import shingle_tf

    d = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x y"), (3, None), (4, "p q r")],
        "doc_id long, text string",
    )
    tf = shingle_tf(d)
    try:
        plan = tf._jdf.queryExecution().executedPlan().toString()
        assert plan.count("split(") <= 2, plan
        # reference: the pre-r15 inlined expression form
        t = F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
        tri = F.transform(
            F.sequence(F.lit(1), F.size(t) - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(t, i), F.element_at(t, i + 1), F.element_at(t, i + 2)
            ),
        )
        ref = (
            d.where(F.size(t) >= 3)
            .select("doc_id", F.explode(tri).alias("token"))
            .groupBy("doc_id", "token")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
        assert sorted(map(tuple, tf.collect())) == sorted(map(tuple, ref.collect()))
    finally:
        tf.unpersist()
