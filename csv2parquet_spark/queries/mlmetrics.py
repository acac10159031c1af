"""Distributed ML evaluation metrics (engine extension; SURVEY.md §2.8
mandates the training-data-pipeline surface around the reference
converter — model-eval metrics are the downstream half of that loop).

``roc_auc_exact`` is the flagship: EXACT ROC-AUC (Mann-Whitney U) over
a corpus-sized score column, tie-correct, with no global sort and no
single-partition window. The identity used:

    AUC = [ Σ_s  n_pos(s) · (cum_neg(<s) + n_neg(s)/2) ] / (N_pos·N_neg)

i.e. group rows by (discretized) score once — a corpus-scale partial
agg shuffling 8-byte keys — then all remaining work happens on the
model-sized per-score relation: the cumulative negative count in score
order comes from the two-pass ``global_cumsum`` (range-partitioned
parallel sort; no Exchange SinglePartition), and the final reduction is
one 1-row aggregate. Everything stays integer until the single terminal
division (the ×2 trick keeps the half-credit tie term integral), so the
oracle hash-matches bit-for-bit at 6 dp.

This is the shape that survives 100 TB: per-row ranking of N scores is
replaced by per-DISTINCT-score arithmetic — the grouped relation is
bounded by the score quantization (here 2 dp), not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from csv2parquet_spark.operators.ranking import global_cumsum
from csv2parquet_spark.queries.registry import register
from csv2parquet_spark.tables import table

# Binary relevance label and a deterministic, tie-RICH score shared by
# both engines: floor(first_component · 100) — identical IEEE double
# multiply + floor on both sides, and 2-dp quantization forces heavy
# ties so the tie-handling term is actually exercised.
_SCORE_SQL = "CAST(floor(CAST(embedding[1] AS DOUBLE) * 100) AS BIGINT)"
_POS_SQL = "CASE WHEN label >= 5 THEN 1 ELSE 0 END"


@register(
    "roc_auc_exact",
    oracle=f"""
    WITH scored AS (
      SELECT {_SCORE_SQL} AS score, {_POS_SQL} AS pos
      FROM embeddings
    ),
    g AS (
      SELECT score,
             sum(pos) AS n_p,
             count(*) - sum(pos) AS n_n
      FROM scored GROUP BY score
    ),
    c AS (
      SELECT score, n_p, n_n,
             sum(n_n) OVER (ORDER BY score
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum_nn
      FROM g
    )
    SELECT CAST(sum(n_p) AS BIGINT) AS n_pos,
           CAST(sum(n_n) AS BIGINT) AS n_neg,
           round(CAST(sum(n_p * (2 * (cum_nn - n_n) + n_n)) AS DOUBLE)
                 / CAST(2 * sum(n_p) * sum(n_n) AS DOUBLE), 6) AS auc
    FROM c
    """,
)
def roc_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tie-corrected ROC-AUC of the first embedding component as a score for
    ``label >= 5``, computed without ranking any individual row.

    Plan: one corpus partial-agg on the 8-byte quantized score →
    ``global_cumsum`` over the model-sized per-score relation (two-pass,
    no single-partition stage) → map-side integer contribution
    ``n_p·(2·cum_neg_below + n_n)`` → one global sum. The only float op
    is the final division; DuckDB's window-based oracle reproduces it
    exactly because every intermediate is integral.
    """
    emb = table(spark, sf_dir, "embeddings")
    scored = emb.select(
        F.floor(F.element_at("embedding", 1).cast("double") * 100)
        .cast("long")
        .alias("score"),
        (F.col("label") >= 5).cast("int").alias("pos"),
    )
    g = scored.groupBy("score").agg(
        F.sum("pos").alias("n_p"),
        (F.count(F.lit(1)) - F.sum("pos")).alias("n_n"),
    )
    c = global_cumsum(g, keys=["score"], weight_col="n_n", cum_col="cum_nn")
    contrib = c.select(
        "n_p",
        "n_n",
        (
            F.col("n_p")
            * (2 * (F.col("cum_nn") - F.col("n_n")) + F.col("n_n"))
        ).alias("num2"),
    )
    return contrib.agg(
        F.sum("n_p").alias("n_pos"),
        F.sum("n_n").alias("n_neg"),
        F.round(
            F.sum("num2").cast("double")
            / (F.lit(2) * F.sum("n_p") * F.sum("n_n")).cast("double"),
            6,
        ).alias("auc"),
    )
