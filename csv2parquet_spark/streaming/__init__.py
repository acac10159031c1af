"""Structured Streaming surface (SURVEY.md §2.6)."""

from csv2parquet_spark.streaming.sinks import (
    read_snapshot,
    streaming_upsert_to_parquet,
    upsert_batch,
)
from csv2parquet_spark.streaming.stateful import (
    user_running_totals,
    user_running_totals_tws,
)
from csv2parquet_spark.streaming.windows import (
    read_events_stream,
    sliding_counts,
    session_counts,
    streaming_dedup,
    streaming_csv_to_parquet,
    streaming_jsonl_to_parquet,
    tumbling_counts,
    run_to_memory,
)

__all__ = [
    "read_events_stream",
    "tumbling_counts",
    "sliding_counts",
    "session_counts",
    "streaming_dedup",
    "streaming_csv_to_parquet",
    "streaming_jsonl_to_parquet",
    "run_to_memory",
    "user_running_totals",
    "user_running_totals_tws",
    "read_snapshot",
    "streaming_upsert_to_parquet",
    "upsert_batch",
]
