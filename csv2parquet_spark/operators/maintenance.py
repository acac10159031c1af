"""Table-maintenance operators for the 100 TB pipeline: small-file
compaction and layout control.

The small-files problem is the classic failure mode of long-running
ingestion (each micro-batch or task writes a file; a year later the
table is a million 2 MB files and every scan pays a million opens).
Compaction rewrites a parquet directory into ~target-sized files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def plan_compaction(
    spark: SparkSession, path: str, target_file_mb: int = 256
) -> tuple[int, int, int]:
    """Inspect a parquet directory: (n_files, total_bytes, n_target_files).

    Driver-side directory listing only — no data read.
    """
    total = 0
    n = 0
    for root, _dirs, files in os.walk(path):
        for fname in files:
            if fname.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, fname))
                n += 1
    target = max(1, round(total / (target_file_mb * 1024 * 1024)))
    return n, total, target


def compact_parquet(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_mb: int = 256,
    sort_by: list[str] | None = None,
) -> int:
    """Rewrite a parquet directory into ~``target_file_mb`` files.

    ``sort_by`` optionally clusters rows (repartitionByRange + local
    sort) so min/max row-group stats become selective — the poor man's
    Z-order for single-column predicates. Returns the file count
    written. Uses a full shuffle only when sorting; otherwise coalesce
    (narrow, no exchange) when shrinking.
    """
    df: DataFrame = spark.read.parquet(path)
    n_files, _total, n_target = plan_compaction(spark, path, target_file_mb)
    if sort_by:
        df = df.repartitionByRange(n_target, *sort_by).sortWithinPartitions(*sort_by)
    elif n_target < n_files:
        df = df.coalesce(n_target)
    else:
        df = df.repartition(n_target)
    df.write.mode("overwrite").parquet(out_path)
    written = sum(
        1
        for _root, _d, files in os.walk(out_path)
        for f in files
        if f.endswith(".parquet")
    )
    return written
