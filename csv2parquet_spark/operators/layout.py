"""Data-layout operators for scan pruning at scale: Z-order clustering
and range-clustered writes.

The reference (`/root/reference/src/main.rs`) writes rows in input
order; at 100 TB the LAYOUT of the output parquet decides how much of
it every later query must read. Parquet readers (Spark, DuckDB, Trino)
skip whole row groups via column min/max statistics — but statistics
only help if the writer clusters values. Sorting by one column prunes
one predicate dimension; interleaving the bits of several columns
(a Z-order / Morton curve) makes row-group min/max boxes tight in ALL
interleaved dimensions at once, so conjunctive range predicates prune
multiplicatively.

Shapes:
* z-value computation is pure Catalyst bit arithmetic (codegen, no
  Python, no shuffle);
* the min/max scaling pass is one small aggregate (2 numbers per
  column, collected to the driver — O(dims), not O(rows));
* the clustered write is ONE range-partitioning shuffle followed by a
  within-partition sort — exactly what a 1000-executor cluster needs:
  every executor writes its own key range, files don't overlap, and
  row-group stats are tight.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scaled(col: Column, mn: float, mx: float, bits: int) -> Column:
    """Map a numeric column into [0, 2^bits) as a long, linearly over
    the observed [mn, mx] range. floor() keeps Spark/DuckDB parity
    (CAST truncates in Spark but rounds in DuckDB)."""
    span = mx - mn
    if span <= 0:
        return F.lit(0).cast("long")
    scale = ((1 << bits) - 1) / span
    return F.floor((col.cast("double") - F.lit(mn)) * F.lit(scale)).cast("long")


def interleave_bits(cols: list[Column], bits: int = 16) -> Column:
    """Morton/Z-value: bit i of column j lands at position i*n_cols + j.

    Pure bit arithmetic — whole-stage codegen, no shuffle. ``cols`` must
    already be scaled to [0, 2^bits) longs; n_cols*bits must be ≤ 63.
    """
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols × {bits} bits exceeds a signed long")
    terms = [
        F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j)
        for j, c in enumerate(cols)
        for i in range(bits)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 16
) -> tuple[DataFrame, Column]:
    """(df, zval column) for ``cols``, scaling each to the observed
    min/max. The range scan is ONE tiny aggregate (2·dims numbers to the
    driver); at a steady-state 100 TB table the ranges come from table
    metadata instead and this pass disappears."""
    ranges = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"mn_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    scaled = [
        _scaled(F.col(c), ranges[f"mn_{c}"], ranges[f"mx_{c}"], bits) for c in cols
    ]
    return df, interleave_bits(scaled, bits)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    num_files: int | None = None,
    block_bytes: int | None = None,
) -> None:
    """Write ``df`` as parquet clustered on the Z-order of ``cols``.

    repartitionByRange on the z-value (one shuffle; Spark samples the
    key distribution so output files are even-sized) then sort within
    partitions — giving non-overlapping z-ranges per file AND tight
    row-group stats inside each file. ``block_bytes`` shrinks row
    groups (parquet.block.size) — useful in tests to get many groups
    from small data; leave default at scale.
    """
    df, z = zorder_key(df, cols, bits)
    with_z = df.withColumn("__z", z)
    parts = num_files or df.sparkSession.sparkContext.defaultParallelism
    writer = (
        with_z.repartitionByRange(parts, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
    )
    if block_bytes:
        writer = writer.option("parquet.block.size", str(block_bytes))
    writer.parquet(path)


def write_range_clustered(
    df: DataFrame, path: str, col: str, num_files: int | None = None
) -> None:
    """Single-column clustered write (the 1-D special case): range
    partition + sort on one key. Best when queries filter on exactly one
    dimension; Z-order dominates for 2-3-dimension conjunctive filters."""
    parts = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(parts, col)
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .parquet(path)
    )


def rowgroup_prune_fraction(
    path: str, predicates: dict[str, tuple[float, float]]
) -> float:
    """Fraction of row groups a min/max-pruning reader SKIPS for a
    conjunctive box predicate {col: (lo, hi)} — measured from real
    parquet footers (the same stats Spark/DuckDB/Trino prune with).
    Diagnostic for layout quality, not a query-path operator."""
    import glob as _glob
    import os as _os

    import pyarrow.parquet as pq

    files = (
        sorted(_glob.glob(_os.path.join(path, "*.parquet")))
        if _os.path.isdir(path)
        else [path]
    )
    total = skipped = 0
    for f in files:
        meta = pq.ParquetFile(f).metadata
        names = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        for rg in range(meta.num_row_groups):
            total += 1
            for c, (lo, hi) in predicates.items():
                st = meta.row_group(rg).column(names[c]).statistics
                # has_min_max: a stats object can exist WITHOUT min/max
                # (all-NULL chunk, truncated binary stats) — st.min is
                # then None and the comparison would TypeError; such a
                # group is simply unprunable (review r8).
                if (
                    st is not None
                    and st.has_min_max
                    and (st.min > hi or st.max < lo)
                ):
                    skipped += 1
                    break
    return skipped / total if total else 0.0


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    key: str,
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` hash-bucketed (and bucket-sorted) on ``key``.

    Bucketing is the co-located-join layout (SURVEY §2 scale notes):
    both sides of a recurring equi-join written with the SAME bucket
    count and key join with NO exchange — each task reads bucket i of
    both tables — and with ``sort=True`` the SortMergeJoin needs no sort
    either. At 100 TB this converts every repeat join/aggregation on the
    bucket key from a full shuffle into a metadata lookup. (Spark's
    bucketing lives in the session catalog: ``saveAsTable``, optionally
    EXTERNAL at ``path``.)
    """
    w = df.write.format("parquet").mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def shard_key(id_col: Column, n_shards: int) -> Column:
    """Deterministic, engine-portable shard id in [0, n_shards):
    the first 8 hex chars of md5(id) as an integer, mod n_shards —
    uniform, stable across runs/engines (DuckDB twin:
    ``CAST(('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8)) AS BIGINT)
    % n``), and independent of partitioning."""
    return (
        F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10).cast(
            "long"
        )
        % n_shards
    ).cast("int")


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 32,
    id_col: str = "doc_id",
    order_col: str | None = None,
) -> list[dict]:
    """Write a training corpus as ``n_shards`` deterministic shards —
    the dataloader-facing layout step: every worker maps shard → file
    set with no coordination, re-runs produce identical shard
    membership (md5 of the id, not Spark partitioning), and shards are
    directory-addressable (``shard=K/``) so a loader reading shards
    [a, b) lists only those directories (partition pruning, same
    mechanism the IVF index uses).

    Returns the manifest: one {shard, n_rows, n_bytes} per shard
    (n_shards dicts — driver-sized). Scale shape: one shuffle
    (repartition on the shard id so each shard is one writer task →
    one file per shard), then a footer-stats pass over n_shards files.
    ``order_col`` optionally sort-within-shards for reproducible
    within-shard order (OFF by default: training loaders shuffle
    anyway).
    """
    import glob as _glob
    import os as _os

    out = df.withColumn("shard", shard_key(F.col(id_col), n_shards))
    out = out.repartition(n_shards, "shard")
    if order_col:
        out = out.sortWithinPartitions("shard", order_col)
    out.write.mode("overwrite").partitionBy("shard").parquet(path)

    import pyarrow.parquet as pq

    manifest = []
    for shard in range(n_shards):
        files = sorted(_glob.glob(_os.path.join(path, f"shard={shard}", "*.parquet")))
        n_rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        n_bytes = sum(_os.path.getsize(f) for f in files)
        manifest.append({"shard": shard, "n_rows": n_rows, "n_bytes": n_bytes})
    return manifest


def compaction_plan(
    files: list[tuple[str, int]], target_bytes: int
) -> list[list[str]]:
    """Bin-pack part files into compaction groups of ~``target_bytes``
    (first-fit-decreasing — within 11/9·OPT+1 of optimal bin count):
    the small-files maintenance planner every lakehouse table needs
    after streaming/incremental writes fragment it. Files larger than
    the target get their own group (never split — rewriting a big file
    buys nothing). Input is (path, size) metadata — model-sized (one
    row per FILE); the planning is driver arithmetic, only the rewrite
    touches data."""
    groups: list[tuple[int, list[str]]] = []
    for path, size in sorted(files, key=lambda ps: (-ps[1], ps[0])):
        for i, (total, members) in enumerate(groups):
            if total + size <= target_bytes:
                groups[i] = (total + size, members + [path])
                break
        else:
            groups.append((size, [path]))
    return [members for _, members in groups]


def compact_small_files(
    spark,
    in_dir: str,
    out_dir: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Execute a compaction plan: read each planned group and write it
    back as ONE file per group (row content preserved exactly; order
    within a group follows the group's file order). Returns
    {"n_input_files", "n_output_files", "plan"}.

    Scale shape: metadata listing is O(files); each group rewrite is an
    independent map-only job reading only its own members — at cluster
    scale the groups run as one job over a file-to-group assignment,
    never a global shuffle of the table."""
    import os
    import shutil

    if os.path.realpath(out_dir) == os.path.realpath(in_dir):
        # The lazily-planned group-0 read executes AFTER mode
        # ("overwrite") has deleted the directory — in-place compaction
        # would destroy the input before reading it (review r8).
        raise ValueError(
            "compact_small_files: out_dir must differ from in_dir "
            "(write to a sibling dir, then swap)"
        )
    files = [
        (os.path.join(in_dir, f), os.path.getsize(os.path.join(in_dir, f)))
        for f in sorted(os.listdir(in_dir))
        if f.endswith(".parquet")
    ]
    plan = compaction_plan(files, target_bytes)
    if not plan:
        # An empty plan must not leave a PREVIOUS compaction's files in
        # out_dir while reporting n_output_files=0 (review r8).
        if os.path.isdir(out_dir):
            shutil.rmtree(out_dir)
        os.makedirs(out_dir)
        return {"n_input_files": 0, "n_output_files": 0, "plan": []}
    for i, group in enumerate(plan):
        (
            spark.read.parquet(*group)
            .coalesce(1)
            .write.mode("overwrite" if i == 0 else "append")
            .parquet(out_dir)
        )
    return {
        "n_input_files": len(files),
        "n_output_files": len(plan),
        "plan": plan,
    }
