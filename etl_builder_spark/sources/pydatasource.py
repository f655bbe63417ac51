"""Python DataSource API (Spark 4, SURVEY §2 A-rows): the engine's
CUSTOM CONNECTOR surface — `pyspark.sql.datasource.DataSource` lets a
pipeline ingest from systems Spark has no built-in reader for
(internal services, queues, bespoke formats) with real distributed
planning: the reader declares InputPartitions, each becomes one task,
and each task streams Arrow RecordBatches.

The declared key routes the documents table THROUGH the connector —
one partition per doc_id shard, pyarrow-filtered reads, Arrow-batch
yields — so the registration, partition planning, per-task reads, and
batch delivery all sit under the t2 hash against the plain relational
oracle.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from etl_builder_spark.registry import register
from etl_builder_spark.session import load_table

#: shard count — power of two so the shard filter is a bit mask
PYDS_PARTS = 4


class _DocsShardReader(DataSourceReader):
    """One InputPartition per doc_id shard; each task reads the shared
    parquet file and keeps its shard (doc_id & (parts-1) == shard).
    Yields pyarrow RecordBatches — the vectorized delivery path — so
    rows never pickle one at a time."""

    def __init__(self, path: str, parts: int) -> None:
        self.path = path
        self.parts = parts

    def partitions(self):
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition):
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        t = pq.read_table(self.path, columns=["doc_id", "lang", "n_chars"])
        mine = t.filter(
            pc.equal(pc.bit_wise_and(t["doc_id"], self.parts - 1), partition.value)
        )
        yield from mine.to_batches()


class DocsPyDataSource(DataSource):
    """The documents table served through the Python DataSource API.
    In production the read() body would call the external system; the
    planning contract (named format, options, schema, partitions) is
    identical."""

    @classmethod
    def name(cls) -> str:
        return "etl_docs_pyds"

    def schema(self) -> str:
        return "doc_id bigint, lang string, n_chars bigint"

    def reader(self, schema):
        return _DocsShardReader(self.options["path"], int(self.options["parts"]))


@register(
    "scan_python_datasource",
    oracle="""
        SELECT doc_id, lang, n_chars
        FROM documents
        ORDER BY doc_id
    """,
    tags=("A-pyds", "connector"),
    declared=11,
)
def scan_python_datasource(spark, sf_dir):
    """The Spark-4 Python DataSource API as a declared, hash-checked
    surface: register the connector class, `spark.read.format(...)`
    by its name, and scan — 4 InputPartitions plan as 4 tasks, each
    pyarrow-reading its doc_id shard and yielding Arrow RecordBatches.
    The oracle is the plain projection of the same table, so any row
    lost, duplicated, or mangled by the connector path (registration,
    option passing, partition planning, per-task filter, Arrow
    delivery) breaks the hash.

    100 TB posture: this is the scale contract custom connectors get —
    partition count is the parallelism (a real connector lists shards/
    splits/offset ranges instead of a modulus), tasks stream batches
    independently with no driver involvement, and the plan is a
    `BatchScan <name> (Python)` leaf that composes with every
    downstream operator.  Filters/column pruning can push into the
    reader via DataSourceReader.pushFilters as a connector grows; the
    declared key keeps the read body minimal on purpose."""
    import os

    # pin session confs the way every declared key does (load_table
    # side effect), keeping plan shapes independent of key build order
    load_table(spark, sf_dir, "documents")
    spark.dataSource.register(DocsPyDataSource)
    return (
        spark.read.format("etl_docs_pyds")
        .option("path", os.path.join(sf_dir, "documents.parquet"))
        .option("parts", str(PYDS_PARTS))
        .load()
        .orderBy("doc_id")
    )
