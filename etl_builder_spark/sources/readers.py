"""Batch readers (SURVEY.md §2 A3, A5).

Policy: schemas are always explicit or footer-carried — NEVER inferred
by sampling data (`inferSchema` reads the input twice and guesses
types; at 100 TB that is both a full extra pass and a correctness
hazard). Parquet/ORC carry schemas in footers; CSV/JSON/text readers
here require a StructType.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Vectorized parquet scan; filters/pruning push down from on top."""
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    delimiter: str = ",",
    timestamp_format: str | None = None,
    mode: str = "FAILFAST",
) -> DataFrame:
    """CSV with an explicit schema. FAILFAST by default: silent
    PERMISSIVE null-filling hides corruption until an aggregate is
    wrong; fail loudly at the scan instead."""
    reader = (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("mode", mode)
    )
    if timestamp_format:
        reader = reader.option("timestampFormat", timestamp_format)
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType,
    multiline: bool = False,
    timestamp_format: str | None = None,
    mode: str = "FAILFAST",
) -> DataFrame:
    """JSON-lines with an explicit schema (multiline only for
    whole-file documents — it is not splittable, so keep files small
    when it is on)."""
    reader = (
        spark.read.schema(schema)
        .option("multiLine", str(multiline).lower())
        .option("mode", mode)
    )
    if timestamp_format:
        reader = reader.option("timestampFormat", timestamp_format)
    return reader.json(path)


def read_text(spark: SparkSession, path: str, whole_file: bool = False) -> DataFrame:
    """Raw text: one row per line (splittable), or one row per file
    (wholetext — for document corpora where files are documents)."""
    return spark.read.option("wholetext", str(whole_file).lower()).text(path)
