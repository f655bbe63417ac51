"""Sources & sinks (SURVEY.md §2 A3-A7): schema-pinned batch readers
(parquet/CSV/JSON/text), partitioned/bucketed writers, and the
streaming file source (streaming/runtime.py)."""
