"""Scan-shape helpers shared across operators and queries."""

from __future__ import annotations

from pyspark.sql import DataFrame


def parallelize_scan(df: DataFrame) -> DataFrame:
    """Repartition a too-few-partition input up to default parallelism.

    CPU-bound map stages (shingling, signature hashing, replica
    explodes) inherit the scan's task count; if the scan has fewer
    partitions than the cluster's cores (locally: one ~10 MB parquet
    file = ONE task), the whole stage runs on a fraction of the
    machine. The repartition shuffles the raw input once — acceptable
    small, and a NO-OP at scale, where a 100 TB scan already yields
    thousands of tasks and the gate never fires.

    The gate compares against FULL defaultParallelism, not half: split
    count overcounts effective tasks when parquet row groups are coarse
    (a byte-range split only produces rows if a row-group midpoint
    falls inside it — the r8 sf3 probe saw a 17-split scan of a
    5-row-group file execute as 5 non-empty tasks, 4 of them 2^25 rows,
    and the ×32 explode behind it ran 6× under-parallel). Between
    cores/2 and cores genuine splits the extra narrow shuffle is noise
    next to the CPU-bound stage it feeds.
    """
    sc = df.sparkSession.sparkContext
    try:
        nparts = df.rdd.getNumPartitions()
    except Exception:
        return df
    if nparts < max(2, sc.defaultParallelism):
        return df.repartition(sc.defaultParallelism)
    return df
