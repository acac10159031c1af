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


def pagerank_fixed(
    edges: DataFrame,
    n_iter: int = 5,
    damp_num: int = 85,
    damp_den: int = 100,
    scale: int = 10**12,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """FIXED-POINT power-iteration PageRank: ranks live in integer
    ``1/scale`` units (BIGINT end-to-end) and damping is the rational
    ``damp_num/damp_den``, so every operation is integer multiply /
    add / floor-divide — exact, associative, and therefore identical
    across partitionings, retries, AND engines (the float variant
    above is deterministic per engine run but its double arithmetic is
    not portable SQL). The recurrence per iteration:

        r'(v) = ((damp_den-damp_num)·scale) // (damp_den·n)
                + (damp_num · (Σ_{u→v} r(u)//deg(u) + dm//n)) // damp_den

    with ``dm`` the summed rank of dangling vertices. Floor divisions
    shed ≤1 unit of mass each — the fixed-point algorithm is DEFINED by
    this recurrence (it is not an approximation of the float one), so
    an independent implementation reproduces it bit-for-bit.

    Same scale shape as :func:`pagerank`: the edge relation is built
    and checkpointed once; each superstep shuffles only (vertex, rank)
    BIGINT pairs. Output: (id, rank_fp) in ``1/scale`` units.
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
    ed = e.join(out_deg, "src").localCheckpoint()

    base = ((damp_den - damp_num) * scale) // (damp_den * n)
    ranks = vertices.withColumn("r", F.lit(scale // n).cast("long")).localCheckpoint()
    for _ in range(n_iter):
        contrib = (
            ed.join(ranks.select(F.col("id").alias("src"), "r"), "src")
            .select("dst", F.expr("r DIV deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").cast("long").alias("inflow"))
        )
        dangling = (
            ranks.join(out_deg.select(F.col("src").alias("id")), "id", "left_anti")
            .agg(F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("dm"))
        )
        ranks = (
            vertices.join(
                contrib.select(F.col("dst").alias("id"), "inflow"), "id", "left"
            )
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damp_num} * (coalesce(inflow, CAST(0 AS BIGINT))"
                        f" + dm DIV {n})) DIV {damp_den}"
                    )
                ).cast("long").alias("r"),
            )
            .localCheckpoint()
        )
    return ranks.select("id", F.col("r").alias("rank_fp"))


__all__ = ["pagerank", "pagerank_fixed"]


def label_propagation(
    edges: DataFrame,
    n_iter: int = 3,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> DataFrame:
    """Synchronous weighted Label Propagation (Raghavan et al. 2007)
    community detection, ``n_iter`` fixed supersteps — deterministic by
    construction so results are engine- and partitioning-independent:
    integer edge weights, next label = the neighbor label with the MAX
    total incident weight, ties to the SMALLEST label, all vertices
    updated simultaneously. Returns ``(id, lbl)`` after the last step.

    The argmax is the engine-portable two-aggregate shape (max weight
    per vertex, then min label among the maximizers) — no struct
    ordering, which DuckDB aggregates can't mirror. Per superstep: one
    join of the checkpointed edge relation with the (vertex, label)
    state + two aggregations keyed by vertex — the shuffled state is
    vertices and candidate labels, never the edge payload; same Pregel
    cost model as :func:`pagerank`.
    """
    # Partition the edge relation on the superstep JOIN key (dst) once —
    # localCheckpoint preserves outputPartitioning, so every superstep's
    # join exchanges only the (vertex, label) state, never the edges.
    e = (
        edges.select(
            F.col(src).alias("src"),
            F.col(dst).alias("dst"),
            F.col(weight).alias("w"),
        )
        .repartition("dst")
        .localCheckpoint()
    )
    labels = (
        e.select(F.col("src").alias("id")).distinct()
        .select("id", F.col("id").alias("lbl"))
        .localCheckpoint()
    )
    for _ in range(n_iter):
        nbr = (
            e.join(labels.select(F.col("id").alias("dst"), "lbl"), "dst")
            .groupBy("src", "lbl")
            .agg(F.sum("w").alias("tw"))
        )
        best = nbr.groupBy("src").agg(F.max("tw").alias("bw"))
        labels = (
            nbr.join(best, "src")
            .filter(F.col("tw") == F.col("bw"))
            .groupBy("src")
            .agg(F.min("lbl").alias("lbl"))
            .select(F.col("src").alias("id"), "lbl")
            .localCheckpoint()
        )
    return labels


def bfs_hops(
    edges: DataFrame,
    source: int,
    n_iter: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Breadth-first hop distances from ``source`` over a directed edge
    list, ``n_iter`` synchronous relaxation supersteps — returns
    ``(id, d)`` for every vertex reached within ``n_iter`` hops
    (unreached vertices are absent, so the result is deterministic and
    engine-portable with no sentinel conventions).

    Per superstep: the current distance relation joins the checkpointed
    edges, candidate ``d+1`` rows union the existing relation, and a
    min-groupBy keeps the best distance — the shuffled state is
    (vertex, distance), never edges; same Pregel cost model as
    :func:`pagerank` / :func:`label_propagation`.
    """
    # Partitioned on the superstep join key (src) once; the checkpoint
    # preserves the partitioning so only the distance state exchanges
    # per round.
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .repartition("src")
        .localCheckpoint()
    )
    dist = (
        e.sparkSession.createDataFrame([(source, 0)], "id bigint, d bigint")
        .localCheckpoint()
    )
    for _ in range(n_iter):
        cand = (
            e.join(dist.select(F.col("id").alias("src"), "d"), "src")
            .select(F.col("dst").alias("id"), (F.col("d") + 1).alias("d"))
        )
        dist = (
            dist.unionByName(cand)
            .groupBy("id")
            .agg(F.min("d").alias("d"))
            .localCheckpoint()
        )
    return dist
