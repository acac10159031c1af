"""Custom Spark 4 Python DataSources (engine extension; the reference
reads only local CSV files — SURVEY.md §2.1 O1)."""

from csv2parquet_spark.sources.pysource import (
    SyntheticDocsDataSource,
    SyntheticEventsStreamDataSource,
)

__all__ = ["SyntheticDocsDataSource", "SyntheticEventsStreamDataSource"]
