"""Distributed-linear-algebra queries over the embeddings table
(operators/linalg.py): hash-checked gram matrix, rows-only PCA
projection (eigendecomposition is not SQL-expressible)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from csv2parquet_spark.queries.registry import register
from csv2parquet_spark.tables import table

_DIM = 64


@register(
    "embedding_gram_matrix",
    oracle=f"""
    SELECT ii.i AS i, jj.j AS j,
           round(sum(e.embedding[ii.i + 1] * e.embedding[jj.j + 1]), 4) AS v
    FROM embeddings e, range(0, {_DIM}) ii(i), range(0, {_DIM}) jj(j)
    GROUP BY ii.i, jj.j
    """,
)
def embedding_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XᵀX over the embedding corpus: each partition reduces to one
    64×64 numpy partial inside mapInPandas, so the shuffle carries
    batches·dim² values — row-count-independent. The DuckDB twin is the
    naive per-element sum; values meet at 4 decimals."""
    from csv2parquet_spark.operators.linalg import gram_matrix

    emb = table(spark, sf_dir, "embeddings")
    g = gram_matrix(emb, "embedding", _DIM)
    return g.select("i", "j", F.round("v", 4).alias("v"))


@register("embedding_pca_project", oracle=None)  # eigh not SQL-expressible
def embedding_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows projected onto the top-2 principal directions of the gram
    matrix (deterministic sign convention). Distributed partial-gram →
    driver eigh (64×64) → broadcast map-only projection."""
    from csv2parquet_spark.operators.linalg import pca_project

    emb = table(spark, sf_dir, "embeddings")
    return pca_project(emb, k=2, dim=_DIM)


@register(
    "ncm_confusion_matrix",
    oracle="""
    WITH ex AS MATERIALIZED (
      SELECT vec_id, label, i - 1 AS pos,
             CAST(embedding[i] AS DOUBLE) AS v
      FROM embeddings,
           LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i)
    ), cent AS MATERIALIZED (
      SELECT label AS clabel, pos,
             CAST(sum(CAST(v AS DECIMAL(20, 10))) AS DOUBLE) / count(*) AS c
      FROM ex GROUP BY label, pos
    ), cn AS MATERIALIZED (
      SELECT clabel,
             CAST(sum(CAST(c * c AS DECIMAL(28, 14))) AS DOUBLE) AS c2
      FROM cent GROUP BY clabel
    ), dots AS (
      SELECT ex.vec_id, ex.label, cent.clabel,
             CAST(sum(CAST(ex.v * cent.c AS DECIMAL(28, 14))) AS DOUBLE) AS dot
      FROM ex JOIN cent USING (pos)
      GROUP BY ex.vec_id, ex.label, cent.clabel
    ), scored AS (
      SELECT d.vec_id, d.label, d.clabel,
             row_number() OVER (PARTITION BY d.vec_id
                                ORDER BY cn.c2 - 2 * d.dot, d.clabel) AS rn
      FROM dots d JOIN cn USING (clabel)
    )
    SELECT label AS true_label, clabel AS pred_label, count(*) AS n
    FROM scored WHERE rn = 1
    GROUP BY label, clabel
    """,
)
def ncm_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-class-mean classifier evaluation over the embedding
    corpus: per-label centroids from the data, every vector assigned to
    its euclidean-nearest centroid (argmin of ||c||^2 - 2 v·c — the
    ||v||^2 term is constant per vector and drops out), reported as the
    (true_label, pred_label) confusion matrix.

    The model-eval shape for embedding pipelines: centroid fitting is a
    narrow (label, pos) aggregate (model-sized output — classes × dims
    cells); scoring joins each exploded coordinate against the 10
    per-position centroid cells (fan-out = n_classes, never corpus ×
    corpus); every float accumulation (centroid means, ||c||^2, dot
    products) is decimal-stabilized so both engines build bit-identical
    scores, and the argmin tie-breaks on the class id.
    """
    e = table(spark, sf_dir, "embeddings")
    ex = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "vf")
    ).select("vec_id", "label", "pos", F.col("vf").cast("double").alias("v"))
    cent = ex.groupBy(F.col("label").alias("clabel"), "pos").agg(
        (
            F.sum(F.col("v").cast("decimal(20,10)")).cast("double") / F.count("*")
        ).alias("c")
    )
    cn = cent.groupBy("clabel").agg(
        F.sum((F.col("c") * F.col("c")).cast("decimal(28,14)"))
        .cast("double")
        .alias("c2")
    )
    dots = (
        ex.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "label", "clabel")
        .agg(
            F.sum((F.col("v") * F.col("c")).cast("decimal(28,14)"))
            .cast("double")
            .alias("dot")
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("c2") - 2 * F.col("dot"), F.col("clabel")
    )
    scored = dots.join(F.broadcast(cn), "clabel").withColumn(
        "rn", F.row_number().over(w)
    )
    return (
        scored.filter(F.col("rn") == 1)
        .groupBy(
            F.col("label").alias("true_label"),
            F.col("clabel").alias("pred_label"),
        )
        .agg(F.count("*").alias("n"))
    )
