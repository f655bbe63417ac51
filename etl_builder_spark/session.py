"""SparkSession factory and table catalog.

Scale posture: tested on local[N] but configured for cluster scale —
AQE on (runtime shuffle-partition coalescing, skew-join splitting,
broadcast conversion), adaptive partition sizing, Arrow at the Python
boundary. On a real 1000-executor cluster the same code runs unchanged;
only ``spark.sql.shuffle.partitions`` / executor sizing move.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: dimension tables small enough to broadcast at any realistic scale factor
BROADCAST_DIMS = frozenset({"region", "nation", "supplier"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(app_name: str = "etl_builder_spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    UTC timezone (corpus timestamps are naive; the DuckDB oracle is
    naive — UTC makes them agree), Arrow for the pandas-UDF boundary,
    AQE for runtime re-planning.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # the parity gate collects FULL result sets driver-side
        # (toPandas canon); pair-valued keys at x100 return >1 GiB in
        # one task, tripping the 1g default maxResultSize (round-14
        # x100 sweep) — a harness sizing knob, not a plan property
        .config("spark.driver.maxResultSize", os.environ.get("SPARK_GRAFT_MAX_RESULT", "8g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    _pin_runtime_confs(spark)
    return spark


def _pin_runtime_confs(spark: SparkSession) -> None:
    """Pin determinism-critical confs even on a session we didn't build.

    The driver constructs its own SparkSession for verification; these
    are runtime-settable so every query helper re-pins them.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Corpus generations that carry events.ts as TIMESTAMP(NANOS) are
    # rejected by Spark's reader by default; read those as raw nanos
    # and let normalize_events_ts convert. Harmless for µs corpora.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Arrow-optimized Python UDTF evaluation (Spark 4): pinned here —
    # not inside any one operator body — so every UDTF-based plan (and
    # the registry-wide BatchEvalPython sweep) sees the same evaluation
    # mode regardless of query build order (ADVICE r4).
    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
    # Python DataSource pushFilters support (Spark 4): pinned here — not
    # inside the connector keys — so the plan-affecting flag is uniformly
    # on for every key instead of leaking in at first connector use
    # (ADVICE r11: cross-key plan-shape bleed).
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize events.ts to session-UTC TimestampType across corpus
    generations.

    The driver has shipped events.ts both as parquet TIMESTAMP(NANOS)
    (arrives as ns-epoch LongType under nanosAsLong) and as
    TIMESTAMP(MICROS) without UTC adjustment (arrives as
    TIMESTAMP_NTZ).  Both normalize to identical TimestampType values:
    integer ``div`` for the ns case (ns magnitudes overflow double
    precision, and the corpus is µs-precision so the truncation is
    lossless — measured, FIXTURES.md), a plain cast for the NTZ case
    (the UTC session timezone makes the wall-clock reinterpretation
    value-preserving).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    dt = df.schema["ts"].dataType
    if isinstance(dt, LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(dt, TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


#: (applicationId, sf_dir, table, file mtime) → LAZY DataFrame handle.
#: Memoizes only the unresolved relation (plan-level reuse — spark.read
#: .parquet resolves the footer schema EAGERLY, ~80ms of driver time
#: per call; r15 measured ~160 load_table calls per bench pass), never
#: any data: every action over the handle still scans the parquet
#: files.  The mtime in the key makes a regenerated corpus at the same
#: path miss the memo; the size bound keeps multi-corpus test sessions
#: from accumulating entries.
_TABLE_CACHE: dict = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one corpus table. Parquet scan → vectorized columnar reader;
    filters/pruning push down from whatever the caller composes on top."""
    _pin_runtime_confs(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        mtime = os.stat(path).st_mtime_ns
    except OSError:
        mtime = -1
    key = (spark.sparkContext.applicationId, path, mtime)
    df = _TABLE_CACHE.get(key)
    if df is None:
        df = spark.read.parquet(path)
        if name == "events":
            df = normalize_events_ts(df)
        if len(_TABLE_CACHE) >= 256:
            _TABLE_CACHE.clear()
        _TABLE_CACHE[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view (mirrors the DuckDB
    oracle's pre-registered views) so SQL and DataFrame entry points
    share one catalog."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
