"""Scan-shape helpers shared across operators and queries."""

from __future__ import annotations

from pyspark.sql import DataFrame

# One-shot latch for the SPARK_GRAFT_DIM_GUARD=0 warning below.
_DIM_GUARD_WARNED = False


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

    Call this at PIPELINE HEADS only, never inside a loop:
    ``df.rdd.getNumPartitions()`` converts the logical plan to an RDD
    on the driver on every call — fine once per query, pure overhead
    when repeated (VERDICT r8 nit).
    """
    import os

    if os.environ.get("SPARK_GRAFT_SCAN_REBALANCE", "1") == "0":  # A/B + debug
        return df
    sc = df.sparkSession.sparkContext
    try:
        nparts = df.rdd.getNumPartitions()
    except Exception:
        return df
    if nparts < max(2, sc.defaultParallelism):
        return df.repartition(sc.defaultParallelism)
    return df


def localcheckpoint_partitioned(df: DataFrame) -> DataFrame:
    """``localCheckpoint()`` that PRESERVES the plan's hash partitioning.

    Under AQE the executed plan is an ``AdaptiveSparkPlanExec``, whose
    ``outputPartitioning`` is ``UnknownPartitioning(0)``; the
    checkpoint's ``LogicalRDD`` records that, so every downstream
    join/aggregate keyed on the materialized layout RE-EXCHANGES the
    checkpointed relation even though the bytes are already laid out
    correctly (plans/r11/lpa_*: one full edge-relation Exchange per
    superstep, ~21 MB × n_iter at sf0.1 and edge-sized at any scale).
    Disabling AQE for just this one eager materialization makes the
    executed plan the raw exchange, whose ``HashPartitioning`` the
    checkpoint records — downstream co-partitioned joins then move only
    the other side (verified: plans/r12/lpa_*, 2 edge Exchanges → 0).

    The trade: the materialized subplan itself runs WITHOUT AQE (static
    ``spark.sql.shuffle.partitions``, no runtime skew split /
    coalescing). Use it for relations the caller has already explicitly
    partitioned for repeated keyed reuse (Pregel edge relations,
    iterative state) where the partition count IS the contract; leave
    one-shot materializations on plain ``localCheckpoint``.

    CAVEAT (r12, found wiring this in): the recorded partitioning binds
    to THIS DataFrame's expression ids. A plan that references the
    checkpoint ONCE reuses the layout; if one plan references it twice
    or more, ``DeduplicateRelations`` re-aliases the later occurrences
    and their recorded partitioning no longer matches — those
    references exchange again. Iterative callers should therefore
    checkpoint their per-iteration STATE every superstep (each
    materialization job then references the edge relation exactly
    once), not every k supersteps.

    ``SPARK_GRAFT_CKPT_PART=0`` falls back to the plain checkpoint
    (A/B + debugging).
    """
    import os

    if os.environ.get("SPARK_GRAFT_CKPT_PART", "1") == "0":  # A/B + debug
        return df.localCheckpoint()
    spark = df.sparkSession
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return df.localCheckpoint()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)


def assert_dim_sized(
    df: DataFrame, what: str, max_rows: int = 5_000_000, hint: str = ""
) -> DataFrame:
    """Enforce a broadcastable-dimension contract: raise if ``df`` has
    more than ``max_rows`` rows.

    Operators whose scale story is "the lookup side is a DIMENSION"
    (fuzzy edit-distance lookup, nested-loop enrichment) degrade to a
    silent quadratic job if a caller hands them a corpus-scale side —
    the one scale-killer class a plan lint can't see, because the plan
    shape is legal (VERDICT r8 item 5). The check is a LocalLimit count
    (``limit(max_rows+1)``): it short-circuits after max_rows+1 rows,
    so the cost is one bounded scan — O(dim) when the contract holds,
    and far cheaper than the quadratic join it prevents when it
    doesn't. The default cap (5M rows) is supplier at TPC-H sf~500,
    comfortably inside executor-broadcast budgets at ~100 B/row.

    EAGERNESS AND DOUBLE-EVALUATION (ADVICE r9): this guard runs a
    Spark job at operator-CONSTRUCTION time, so operators that call it
    (``knn_join``, ``fuzzy_dim_join``) are no longer lazy — a plan-only
    use (``.explain()``, plan hashing, dry runs) executes the bounded
    count — and the guarded side is evaluated TWICE (once counted here,
    once in the real join). A NONDETERMINISTIC guarded side (e.g. a
    ``.sample()`` without a seeded, cached frame) can therefore pass
    the count with one draw and broadcast a different one: cache or
    ``localCheckpoint()`` nondeterministic sides before handing them to
    a guarded operator. Plan-only tooling that must stay job-free can
    opt out for the process via ``SPARK_GRAFT_DIM_GUARD=0`` — the
    contract still holds semantically; only its eager enforcement is
    skipped.
    """
    import os

    if os.environ.get("SPARK_GRAFT_DIM_GUARD", "1") == "0":
        # One-time loud trace (ADVICE r10): the env var is meant for
        # plan-only tooling; if it leaks into a real run, the
        # quadratic-join path reopens — make that visible in logs
        # instead of silent.
        global _DIM_GUARD_WARNED
        if not _DIM_GUARD_WARNED:
            _DIM_GUARD_WARNED = True
            import warnings

            warnings.warn(
                "SPARK_GRAFT_DIM_GUARD=0: the broadcastable-dimension "
                "size guard is DISABLED process-wide; oversized lookup "
                "sides will broadcast unchecked (intended only for "
                "plan-only tooling that must stay job-free)",
                RuntimeWarning,
                stacklevel=2,
            )
        return df
    n = df.limit(max_rows + 1).count()
    if n > max_rows:
        raise ValueError(
            f"{what}: lookup side exceeds the dimension contract "
            f"(> {max_rows} rows). An all-pairs match against a "
            f"corpus-scale side has no scale path"
            + (f" — {hint}" if hint else "")
        )
    return df
