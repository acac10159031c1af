"""Iterative graph algorithms over pair DataFrames (engine extension —
the reference has no graph surface; companion to
``operators/dedup.py:connected_components``).

PageRank here is the Pregel-on-DataFrames shape: one hash-partitioned
edge relation reused every superstep, rank state re-derived by a
join + groupBy per iteration, ``localCheckpoint`` truncating lineage so
the plan stays iteration-count-independent. At 100 TB the edge relation
is partitioned by src once and every superstep's join co-locates on
that key — the per-round cost is one shuffle of the (vertex, rank)
state, never the edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Per-contribution decimal cast: IEEE addition is not associative, so
# rank sums are accumulated in DECIMAL(38,18) — bit-identical results
# regardless of partial-aggregation order (same discipline as
# queries/helpers.dsum, which pins the 6dp variant engine-wide).
_DEC = "decimal(38,18)"


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    n_iter: int = 5,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Power-iteration PageRank over a directed edge list.

    Deterministic by construction: per-edge contributions are
    decimal-cast before summing, dangling mass is redistributed
    uniformly from an exact decimal total, and the iteration count is
    fixed (no float-compared convergence test). Output: (id, rank)
    with rank rounded to 6dp, summing to ~1.

    Vertices = union of endpoints. Uniform initial rank 1/N.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    vertices = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    n = vertices.count()  # scalar: one number to the driver
    out_deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    # Edge relation with degree attached, partitioned once and reused
    # every superstep (checkpoint pins it; nothing recomputes).
    ed = e.join(out_deg, "src").localCheckpoint()

    ranks = vertices.withColumn("rank", F.lit(1.0 / n)).localCheckpoint()
    for _ in range(n_iter):
        contrib = (
            ed.join(ranks.select(F.col("id").alias("src"), "rank"), "src")
            .select("dst", (F.col("rank") / F.col("deg")).cast(_DEC).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        # Dangling vertices (no out-edges) leak their rank; redistribute
        # it uniformly. The total is a 1-row exact decimal aggregate.
        dangling = (
            ranks.join(out_deg.select(F.col("src").alias("id")), "id", "left_anti")
            .agg(F.coalesce(F.sum(F.col("rank").cast(_DEC)), F.lit(0).cast(_DEC)).alias("dm"))
        )
        ranks = (
            ranks.select("id")
            .join(contrib.select(F.col("dst").alias("id"), "inflow"), "id", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("inflow").cast("double"), F.lit(0.0))
                        + F.col("dm").cast("double") / n
                    )
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks.select("id", F.round("rank", 6).alias("rank"))


__all__ = ["pagerank"]
