"""Distributed-linear-algebra queries over the embeddings table
(operators/linalg.py): hash-checked gram matrix, rows-only PCA
projection (eigendecomposition is not SQL-expressible)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
