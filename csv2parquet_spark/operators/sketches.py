"""Mergeable sketches as plain DataFrames (SURVEY.md §2.8 "a novel
sketch"): a Count-Min sketch over a token stream.

The sketch IS a tiny DataFrame (depth × width counter cells), built by
one partial-aggregate-friendly groupBy — the map side reduces each
partition to ≤ depth·width cells before the shuffle, so sketch
construction over 100 TB of text shuffles kilobytes. Sketches merge by
unioning cell tables and re-summing (the operation distributive
aggregation gives for free), which is what makes the structure useful
for per-day / per-shard rollups.

Hash functions are the 4 disjoint 8-hex-char slices of md5(token):
deterministic, engine-independent (DuckDB reproduces them exactly — the
oracle in queries/sketches_q.py is generated from the same constants),
and uniform enough for counter bucketing. At production scale swap in
xxhash64(token, seed_k) — same plan shape, cheaper hashing, no oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 4  # md5 yields 4 disjoint 32-bit slices
CMS_WIDTH = 1024


def cms_bucket(col: Column, k: int, width: int = CMS_WIDTH) -> Column:
    """Hash-k bucket id: 32-bit slice k of md5, mod width."""
    return (
        F.conv(F.substring(F.md5(col), 1 + 8 * k, 8), 16, 10).cast("long") % width
    )


def cms_build(
    tokens: DataFrame,
    col: str = "token",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(k, b, c): the Count-Min counter table from a token stream.

    The explode multiplies rows by ``depth`` map-side, but partial
    aggregation collapses every partition to ≤ depth·width cells before
    the single tiny shuffle.
    """
    rows = tokens.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("k"),
                        cms_bucket(F.col(col), k, width).alias("b"),
                    )
                    for k in range(depth)
                ]
            )
        ).alias("kb")
    )
    return (
        rows.select("kb.k", "kb.b")
        .groupBy("k", "b")
        .agg(F.count("*").alias("c"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Union counter tables and re-sum — the distributive merge."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("k", "b").agg(F.sum("c").alias("c"))


def cms_lookup(
    sketch: DataFrame,
    queries: DataFrame,
    col: str = "token",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point estimates for ``queries[col]``: min over the depth counter
    cells each token hashes to. The sketch is broadcast (≤ depth·width
    rows); estimates are upper bounds (CMS never undercounts)."""
    q = queries.select(
        F.col(col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("k"),
                        cms_bucket(F.col(col), k, width).alias("b"),
                    )
                    for k in range(depth)
                ]
            )
        ).alias("kb"),
    ).select(col, "kb.k", "kb.b")
    return (
        q.join(F.broadcast(sketch), ["k", "b"])
        .groupBy(col)
        .agg(F.min("c").alias("cms_estimate"))
    )
