"""Scale smoke tests: the LLM-pipeline hot paths at 100-200× the oracle
fixture size, asserting structural invariants that must hold at any
size. The point is not timing (the box varies) but that the
bucketed/blocked shapes execute far beyond the toy SF without a
quadratic stage or an executor-memory blowup.

Corpus design matters here: the near-dup fixture must be HIGH-entropy
(md5-derived tokens, essentially zero cross-doc overlap) with PLANTED
duplicates, because a low-entropy corpus makes the near-dup OUTPUT
itself quadratic — any implementation, however well blocked, drowns in
its own (correct) result set. A first draft of this file used the
21-word `synthetic_docs` vocabulary at 100k docs and did exactly that.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

N_DOCS = 100_000


@pytest.fixture(scope="module")
def big_docs(spark):
    """100k docs of 40 md5-derived 8-char tokens. Docs 10k and 10k+1
    share a seed (exact duplicates); everything else is ~disjoint."""
    seed = F.when(
        (F.col("id") % 10 == 1), F.col("id") - 1
    ).otherwise(F.col("id"))
    text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(40)),
            lambda j: F.substring(
                F.md5(F.concat(seed.cast("string"), F.lit(":"), j.cast("string"))),
                1,
                8,
            ),
        ),
    )
    return (
        spark.range(N_DOCS)
        .repartition(16)
        .select(F.col("id").alias("doc_id"), text.alias("text"))
        .localCheckpoint()
    )


def test_exact_dedup_at_100k(spark, big_docs):
    """Exact dedup over 100k docs: count conservation (every doc lands
    in exactly one group) and the planted pairs collapse — exactly
    N/10 fewer groups than docs."""
    from csv2parquet_spark.operators.dedup import exact_dedup

    d = exact_dedup(big_docs)
    agg = d.agg(
        F.sum("n_copies").alias("total"), F.count(F.lit(1)).alias("groups")
    ).collect()[0]
    assert agg.total == N_DOCS
    assert agg.groups == N_DOCS - N_DOCS // 10


def test_paragraph_dedup_at_100k(spark, big_docs):
    """Chunk-level dedup over 100k docs: the two-shuffle plan executes;
    a duplicate doc keeps ZERO chunks (its twin owns them all), every
    non-duplicate keeps all of its chunks."""
    from csv2parquet_spark.operators.dedup import chunk_level_dedup

    out = chunk_level_dedup(big_docs, size=16).localCheckpoint()
    assert out.count() == N_DOCS
    dup_kept = (
        out.filter(F.col("doc_id") % 10 == 1)
        .agg(F.sum("n_kept"))
        .collect()[0][0]
    )
    assert dup_kept == 0
    bad = out.filter(
        (F.col("doc_id") % 10 != 1) & (F.col("n_kept") != F.col("n_chunks"))
    ).count()
    assert bad == 0


def test_minhash_lsh_at_100k(spark, big_docs):
    """MinHash-LSH near-dup detection over 100k docs: the banded
    self-join + exact verify recovers EXACTLY the 10k planted duplicate
    pairs (J=1.0 always survives banding) and nothing else — executed
    end-to-end with no quadratic stage."""
    from csv2parquet_spark.operators.dedup import minhash_near_dups

    pairs = minhash_near_dups(big_docs, threshold=0.9).localCheckpoint()
    assert pairs.count() == N_DOCS // 10
    bad = pairs.filter(
        (F.col("id_b") != F.col("id_a") + 1)
        | (F.col("id_a") % 10 != 0)
        | (F.col("jaccard") < 1.0)
    ).count()
    assert bad == 0


def test_embedding_near_dups_at_20k_with_forced_salting(spark):
    """The int8-LSH embedding near-dup path at 10× the fixture size,
    with bucket_cap forced low enough that EVERY (table, bucket) group
    takes the salted pair-block decomposition: 20k random-ish unit
    vectors (md5-derived, pairwise ~orthogonal) with 2k planted
    duplicate pairs must yield exactly those pairs at threshold 0.9."""
    from csv2parquet_spark.operators.similarity import pairwise_near_dups

    n = 20_000
    seed = F.when((F.col("id") % 10 == 1), F.col("id") - 1).otherwise(F.col("id"))
    emb = F.transform(
        F.sequence(F.lit(1), F.lit(64)),
        lambda j: (
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(seed.cast("string"), F.lit("/"), j.cast("string"))),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("double")
                / F.lit(float(1 << 32))
            )
            - 0.5
        ).cast("float"),
    )
    vecs = (
        spark.range(n)
        .repartition(16)
        .select(F.col("id").alias("vec_id"), emb.alias("embedding"))
        .localCheckpoint()
    )
    pairs = pairwise_near_dups(
        vecs, threshold=0.9, bucket_cap=512
    ).localCheckpoint()
    assert pairs.count() == n // 10
    bad = pairs.filter(
        (F.col("id_b") != F.col("id_a") + 1)
        | (F.col("id_a") % 10 != 0)
        | (F.col("sim") < 0.9)
    ).count()
    assert bad == 0
