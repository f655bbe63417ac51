"""Python UDTF surface (SURVEY.md §2 K4): table functions that emit
multiple rows per input row. The declared query tokenizes with
positions through a real `@udtf` class and is checked exactly against
the oracle's positional unnest — proving the UDTF path produces
relational output identical to the declarative form.

(As with all Python paths: the UDTF is the demonstration of the seam;
pure tokenization would normally stay JVM-side via posexplode.)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_builder_spark.registry import register
from etl_builder_spark.session import load_table


def _tokenize_udtf():
    """Build the UDTF lazily (decorating at import time would need an
    active session for DDL parsing)."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("pos", IntegerType()),
            StructField("token", StringType()),
        ]
    )

    @udtf(returnType=schema)
    class TokenizeWithPos:
        def eval(self, doc_id: int, text: str):
            for i, tok in enumerate(text.split(" ")):
                if tok:
                    yield doc_id, i + 1, tok

    return TokenizeWithPos


@register(
    "udtf_tokenize_pos",
    oracle="""
        SELECT doc_id,
               CAST(generate_subscripts(string_split(text, ' '), 1) AS INTEGER) AS pos,
               unnest(string_split(text, ' ')) AS token
        FROM documents
        WHERE doc_id < 50
    """,
    tags=("K4",),
)
def udtf_tokenize_pos(spark, sf_dir):
    # Arrow-optimized UDTF evaluation (Spark 4): batches cross the
    # Python boundary as Arrow instead of pickled rows —
    # ArrowEvalPythonUDTF in the plan, same results, and it keeps the
    # repo's zero-BatchEvalPython invariant (plan-swept in
    # tests/test_plans.py).  The enabling conf is pinned session-wide
    # in session._pin_runtime_confs (load_table runs it on every call),
    # never mutated here — per-operator conf writes made plan shapes
    # depend on query build order (ADVICE r4).
    spark.udtf.register("tokenize_pos", _tokenize_udtf())
    load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50).createOrReplaceTempView(
        "docs_head"
    )
    return spark.sql(
        """
        SELECT t.doc_id, t.pos, t.token
        FROM docs_head d, LATERAL tokenize_pos(d.doc_id, d.text) t
        """
    )


@register(
    "fn_json_variant",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        FROM events
    """,
    tags=("H7-variant",),
)
def fn_json_variant(spark, sf_dir):
    """Spark 4 VariantType path: parse_json → variant_get. Extracted
    value is identical to classic JSON-path extraction, so the oracle
    stays exact."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.try_variant_get(F.parse_json("props"), "$.k", "bigint").alias("k_val"),
    )
