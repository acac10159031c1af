"""Custom Spark 4 Python DataSources (engine extension; the reference
reads only local CSV files — SURVEY.md §2.1 O1). Readers (batch +
streaming) and the jsonl_audit sink (batch Arrow writer + streaming
writer with per-batch commit manifests)."""

from csv2parquet_spark.sources.pysource import (
    JsonlAuditDataSource,
    SyntheticDocsDataSource,
    SyntheticEventsStreamDataSource,
)

__all__ = [
    "JsonlAuditDataSource",
    "SyntheticDocsDataSource",
    "SyntheticEventsStreamDataSource",
]
