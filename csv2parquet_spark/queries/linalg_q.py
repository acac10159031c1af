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


_KM_K, _KM_ITER = 4, 2


def _km_dist_sql(vec: str, cent: str) -> str:
    return (
        f"list_sum(list_transform(range(1, {_DIM} + 1), "
        f"i -> (CAST({vec}[i] AS DOUBLE) - {cent}[i])"
        f" * (CAST({vec}[i] AS DOUBLE) - {cent}[i])))"
    )


def _kmeans_oracle(k: int = _KM_K, n_iter: int = _KM_ITER) -> str:
    """Chained-CTE Lloyd's k-means mirroring the query exactly: md5-min
    init, squared-euclidean CASE-chain argmin (ties → lower cluster),
    per-component decimal-summed means rounded to 6dp each iteration,
    carry-forward for empty clusters. list_sum's sequential fold pairs
    with Spark's F.aggregate (the proven similarity_topk_exact
    pairing), so the float distances are bit-identical."""
    parts = [f"""
    WITH emb AS MATERIALIZED (
      SELECT vec_id, embedding FROM embeddings
    ), c0 AS MATERIALIZED (
      SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS cluster,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cent
      FROM emb ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {k}
    )"""]
    for t in range(1, n_iter + 1):
        ks = ", ".join(
            f"(SELECT cent FROM c{t - 1} WHERE cluster = {c}) AS k{c}"
            for c in range(k)
        )
        ds = ",\n        ".join(
            f"{_km_dist_sql('v.embedding', f'kk.k{c}')} AS dc{c}" for c in range(k)
        )
        whens = " ".join(
            "WHEN "
            + " AND ".join(f"dc{c} <= dc{o}" for o in range(c + 1, k))
            + f" THEN {c}"
            for c in range(k - 1)
        )
        parts.append(f"""
    , kk{t} AS MATERIALIZED (
      SELECT {ks}
    ), d{t} AS MATERIALIZED (
      SELECT v.vec_id, v.embedding,
        {ds}
      FROM emb v CROSS JOIN kk{t} kk
    ), a{t} AS MATERIALIZED (
      SELECT vec_id, embedding,
        CASE {whens} ELSE {k - 1} END AS cluster
      FROM d{t}
    ), m{t} AS MATERIALIZED (
      SELECT cluster, pos,
        round(CAST(sum(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,12))) AS DOUBLE)
              / count(*), 6) AS mm
      FROM (SELECT cluster, r.i AS pos, embedding[r.i] AS x
            FROM a{t}, LATERAL (SELECT unnest(range(1, {_DIM} + 1)) AS i) AS r)
      GROUP BY cluster, pos
    ), mc{t} AS MATERIALIZED (
      SELECT cluster, list(mm ORDER BY pos) AS cent FROM m{t} GROUP BY cluster
    ), c{t} AS MATERIALIZED (
      SELECT cluster, cent FROM mc{t}
      UNION ALL
      SELECT p.cluster, p.cent FROM c{t - 1} p
      WHERE p.cluster NOT IN (SELECT cluster FROM mc{t})
    )""")
    parts.append(f"""
    SELECT a.cluster, CAST(count(*) AS BIGINT) AS n_vecs, ck.checksum
    FROM a{n_iter} a JOIN (
      SELECT cluster,
             CAST(sum(CAST(mm AS DECIMAL(18,6))) AS DOUBLE) AS checksum
      FROM m{n_iter} GROUP BY cluster
    ) ck USING (cluster)
    GROUP BY a.cluster, ck.checksum
    """)
    return "".join(parts)


@register("kmeans_train_clusters", oracle=_kmeans_oracle())
def kmeans_train_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means TRAINING LOOP, hash-proven end-to-end (the
    clustering sibling of ``logreg_gd_weights``): k=4 centroids
    initialized from the 4 vectors with the smallest md5(vec_id)
    (deterministic, data-derived, SQL-reproducible — unlike the
    xxhash64 init of ``operators/similarity.kmeans_centroids``, which
    stays the IVF scale path with its broadcast-matrix pandas-UDF
    assignment), then 2 iterations of: squared-euclidean argmin
    assignment (explicit CASE chain, ties to the lower cluster id) and
    per-component mean update (per-row DECIMAL(18,12) casts make the
    sums association-proof; means rounded to 6dp at every iteration
    boundary per the engine's iterative-float protocol). Output:
    cluster sizes from the final assignment plus an exact
    decimal-summed checksum of the final rounded centroid components.

    Scale shape: per iteration one map-only assignment pass over the
    corpus (centroids are literals — model-sized) and one
    posexplode → partial-agg shuffle of n·dim scalar terms; only the
    k×dim means ever reach the driver (the logreg precedent). Distance
    folds use F.aggregate(zip_with(...)) whose left-to-right order
    pairs bit-identically with DuckDB's list_sum (proven by
    similarity_topk_exact)."""
    k = _KM_K
    emb = table(spark, sf_dir, "embeddings")
    init = (
        emb.orderBy(F.md5(F.col("vec_id").cast("string")))
        .limit(k)
        .select("embedding")
        .collect()
    )
    cents = [[float(x) for x in r.embedding] for r in init]

    def assign(cents):
        dcols = []
        for c, cent in enumerate(cents):
            carr = F.array(*[F.lit(float(v)) for v in cent])
            diffs = F.zip_with(
                F.col("embedding").cast("array<double>"),
                carr,
                lambda x, y: (x - y) * (x - y),
            )
            dcols.append(
                F.aggregate(diffs, F.lit(0.0), lambda a, x: a + x).alias(f"dc{c}")
            )
        d = emb.select("vec_id", "embedding", *dcols)
        cl = F.when(
            (F.col("dc0") <= F.col("dc1"))
            & (F.col("dc0") <= F.col("dc2"))
            & (F.col("dc0") <= F.col("dc3")),
            0,
        ).when(
            (F.col("dc1") <= F.col("dc2")) & (F.col("dc1") <= F.col("dc3")), 1
        ).when(F.col("dc2") <= F.col("dc3"), 2).otherwise(3)
        return d.select("vec_id", "embedding", cl.alias("cluster"))

    assigned = means = None
    for _ in range(_KM_ITER):
        assigned = assign(cents)
        means = (
            assigned.select(
                "cluster",
                F.posexplode(F.col("embedding").cast("array<double>")).alias(
                    "pos", "x"
                ),
            )
            .groupBy("cluster", "pos")
            .agg(
                F.round(
                    F.sum(F.col("x").cast("decimal(18,12)")).cast("double")
                    / F.count("*"),
                    6,
                ).alias("mm")
            )
            .localCheckpoint()  # k·dim rows; reused for cents AND checksum
        )
        rows = (
            means.groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "mm"))).alias("pm"))
            .select("cluster", F.col("pm.mm").alias("cent"))
            .collect()
        )
        new = {c: cents[c] for c in range(k)}  # empty cluster → carry forward
        for r in rows:
            new[r.cluster] = [float(x) for x in r.cent]
        cents = [new[c] for c in range(k)]

    counts = assigned.groupBy("cluster").agg(F.count("*").alias("n_vecs"))
    ck = means.groupBy("cluster").agg(
        F.sum(F.col("mm").cast("decimal(18,6)")).cast("double").alias("checksum")
    )
    return counts.join(ck, "cluster").select("cluster", "n_vecs", "checksum")
