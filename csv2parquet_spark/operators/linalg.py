"""Distributed linear algebra over embedding columns: gram matrix and
PCA projection (SURVEY.md §2.8 similarity-search family).

The 100 TB shape for second-moment statistics: each partition reduces
its rows to ONE dim×dim partial (numpy BLAS inside an Arrow-batched
``mapInPandas``), so the shuffle carries `n_partitions · dim²` numbers
— independent of row count. The driver-side eigendecomposition is
O(dim³) on a 64×64 matrix (microseconds); components broadcast back for
the map-only projection pass. This is the standard large-scale PCA
split: data-sized work stays distributed, model-sized work is local.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gram_matrix(df: DataFrame, vec_col: str = "embedding", dim: int = 64) -> DataFrame:
    """(i, j, v): Σ rows x·xᵀ — one dim² partial per Arrow batch, then
    an elementwise sum keyed by (i, j). Shuffle volume is
    batches × dim², never rows × dim²."""

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        acc = np.zeros((dim, dim))
        seen = False
        for pdf in batches:
            if len(pdf):
                V = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
                if V.shape[1] != dim:
                    # clear diagnostic instead of a shape-mismatch crash
                    # deep inside the matmul (review r8)
                    raise ValueError(
                        f"gram_matrix: {vec_col!r} vectors have dim "
                        f"{V.shape[1]}, expected {dim}"
                    )
                acc += V.T @ V
                seen = True
        if seen:
            ii = np.repeat(np.arange(dim), dim)
            jj = np.tile(np.arange(dim), dim)
            yield pd.DataFrame({"i": ii, "j": jj, "v": acc.ravel()})

    # NULL embeddings would die as an opaque np.asarray(None) TypeError
    # per-task after substantial work; a NULL row contributes nothing
    # to Σ x·xᵀ, so dropping it IS the math (review r8).
    parts = (
        df.select(vec_col)
        .filter(F.col(vec_col).isNotNull())
        .mapInPandas(partials, "i int, j int, v double")
    )
    return parts.groupBy("i", "j").agg(F.sum("v").alias("v"))


def principal_components(
    df: DataFrame, k: int = 2, vec_col: str = "embedding", dim: int = 64
):
    """Top-k eigenvectors of the (uncentered) gram matrix as a
    (k × dim) numpy array. Sign convention: each component's
    largest-|coefficient| entry is made positive, so the result is
    deterministic for a given gram matrix (eigenvectors are otherwise
    sign-ambiguous)."""
    import numpy as np

    rows = gram_matrix(df, vec_col, dim).collect()  # dim² scalars — model-sized
    G = np.zeros((dim, dim))
    for r in rows:
        G[r.i, r.j] = r.v
    w, v = np.linalg.eigh(G)  # ascending eigenvalues
    comps = v[:, ::-1][:, :k].T  # rows = components, descending λ
    for c in comps:
        if c[int(abs(c).argmax())] < 0:
            c *= -1.0
    return comps


def pca_project(
    df: DataFrame,
    k: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
) -> DataFrame:
    """(id, p_0..p_{k-1}): rows projected onto the top-k principal
    directions. The component matrix is broadcast inside a vectorized
    pandas UDF — projection is map-only, no shuffle."""
    import numpy as np
    from pyspark.sql.pandas.functions import pandas_udf

    comps = principal_components(df, k, vec_col, dim)
    C = comps.T  # dim × k

    @pandas_udf("array<double>")
    def project(vs: pd.Series) -> pd.Series:
        V = np.vstack([np.asarray(v, dtype=np.float64) for v in vs])
        P = V @ C
        return pd.Series(list(P))

    # NULL embeddings have no projection — drop them up front instead
    # of crashing np.asarray(None) inside the UDF (review r8).
    out = df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col), project(F.col(vec_col)).alias("p")
    )
    return out.select(
        id_col, *[F.round(F.col("p")[i], 4).alias(f"p_{i}") for i in range(k)]
    )
