"""Streaming sinks beyond append: keyed upsert into a parquet snapshot
via ``foreachBatch`` (SURVEY.md §2.6 extension — the reference has no
streaming at all, and Spark's parquet sink is append-only).

Pattern: each micro-batch is merged into the current snapshot with
last-writer-wins semantics on the key, and the new snapshot is swapped
in atomically (write to versioned dir + repoint a manifest). This is the
standard lakehouse-lite upsert loop; with a table format (Delta/Iceberg)
``MERGE INTO`` replaces the swap, but the batch-side plan — broadcast or
shuffle join on the key, one snapshot rewrite per trigger — is the same.

Scale notes: the merge joins snapshot × batch on the key; Spark picks a
broadcast join while the BATCH side is small (the common case — a
micro-batch is minutes of data, the snapshot is the history). The
snapshot rewrite is the cost: at 100 TB you partition the snapshot by a
key prefix/date and rewrite only partitions the batch touches (the
``partition_col`` hook), which turns the rewrite into touched-partition
I/O instead of a full-table pass.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST = "_CURRENT"


def read_snapshot(spark: SparkSession, root: str) -> DataFrame | None:
    """Current snapshot DataFrame, or None before the first batch."""
    m = os.path.join(root, _MANIFEST)
    if not os.path.exists(m):
        return None
    with open(m) as f:
        return spark.read.parquet(os.path.join(root, f.read().strip()))


def _swap_in(root: str, version: int) -> None:
    tmp = os.path.join(root, _MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        f.write(f"v{version}")
    os.replace(tmp, os.path.join(root, _MANIFEST))  # atomic repoint
    # GC superseded snapshots (keep current + previous for readers)
    for d in os.listdir(root):
        if d.startswith("v") and d[1:].isdigit() and int(d[1:]) < version - 1:
            shutil.rmtree(os.path.join(root, d), ignore_errors=True)


def _current_version(root: str) -> int | None:
    m = os.path.join(root, _MANIFEST)
    if not os.path.exists(m):
        return None
    with open(m) as f:
        v = f.read().strip()
    return int(v[1:]) if v.startswith("v") and v[1:].isdigit() else None


def upsert_batch(
    spark: SparkSession, root: str, batch: DataFrame, key: str, version: int
) -> None:
    """Merge one batch into the snapshot: last-writer-wins on ``key``
    (within a batch, the row with the highest ``__seq`` wins if the
    column is present — ties on ``__seq`` are arbitrary; without it the
    within-batch winner is arbitrary; across batches, the newer batch
    wins via anti-join).

    Idempotent against crash-after-swap replays: if the manifest already
    points at this ``version`` or newer, the batch was fully applied
    before the streaming checkpoint committed — re-merging would read
    the v{version} snapshot while overwriting the same directory (which
    Spark rejects, wedging the stream on every restart), so the replay
    is a no-op instead."""
    os.makedirs(root, exist_ok=True)
    cur_v = _current_version(root)
    if cur_v is not None and cur_v >= version:
        return
    current = read_snapshot(spark, root)
    if "__seq" in batch.columns:
        from pyspark.sql.window import Window

        w = Window.partitionBy(key).orderBy(F.desc("__seq"))
        fresh = (
            batch.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    else:
        fresh = batch.dropDuplicates([key])
    merged = (
        fresh
        if current is None
        else current.join(fresh.select(key), key, "left_anti").unionByName(fresh)
    )
    merged.write.mode("overwrite").parquet(os.path.join(root, f"v{version}"))
    _swap_in(root, version)


def streaming_upsert_to_parquet(
    spark: SparkSession,
    stream: DataFrame,
    root: str,
    key: str,
    checkpoint_dir: str,
):
    """Drive a stream into the upsert snapshot with exactly-once batches
    (foreachBatch + checkpoint: a replayed batch overwrites the same
    version directory, so retries are idempotent)."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        upsert_batch(spark, root, batch, key, int(batch_id))

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
