"""Cross-engine string-folding pins (etl_builder_spark/folding.py).

The extremetext sweep (round 12) found Spark (Java full case mapping)
and DuckDB (utf8proc simple mapping) disagree on lower('İ') and
upper('ß'); these tests pin the folded forms EQUAL across engines on
the trap inputs and IDENTITY on ASCII."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from etl_builder_spark.folding import (
    fold_lower,
    fold_lower_sql,
    fold_upper,
    fold_upper_sql,
)

TRAPS = [
    "İstanbul",      # Java lower -> i + U+0307; utf8proc -> i
    "ß STRASSE straße",  # Java upper -> SS; utf8proc -> U+1E9E
    "ıi II",         # dotless ı
    "café résumé",  # NFD combining acute (must survive)
    "PLAIN ascii 123",
    "",
]


@pytest.mark.parametrize("s", TRAPS)
def test_fold_lower_agrees_across_engines(spark, s):
    got_spark = spark.range(1).select(fold_lower(F.lit(s)).alias("x")).first().x
    got_duck = duckdb.connect().execute(
        "SELECT " + fold_lower_sql("?"), [s]
    ).fetchone()[0]
    assert got_spark == got_duck, (s, got_spark, got_duck)


@pytest.mark.parametrize("s", TRAPS)
def test_fold_upper_agrees_across_engines(spark, s):
    got_spark = spark.range(1).select(fold_upper(F.lit(s)).alias("x")).first().x
    got_duck = duckdb.connect().execute(
        "SELECT " + fold_upper_sql("?"), [s]
    ).fetchone()[0]
    assert got_spark == got_duck, (s, got_spark, got_duck)


def test_fold_is_identity_on_ascii(spark):
    """On pure-ASCII text the pins are plain lower/upper — the provable
    no-real-corpus-change property every pin in folding.py claims."""
    s = "The Quick BROWN fox #123"
    row = spark.range(1).select(
        fold_lower(F.lit(s)).alias("lo"), fold_upper(F.lit(s)).alias("up")
    ).first()
    assert row.lo == s.lower()
    assert row.up == s.upper()
