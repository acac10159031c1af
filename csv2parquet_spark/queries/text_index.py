"""Tokenizer-training and retrieval-index primitives over ``documents``
(engine extension, SURVEY.md §2.8): adjacent-pair counting (the BPE
merge-selection step), a bounded-postings inverted index, and TextRank
(PageRank over the token-transition graph).

Tokenization is the registry-wide space-split convention
(``string_split(text, ' ')`` ↔ ``F.split(text, ' ')``) so oracles stay
engine-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from csv2parquet_spark.operators.graph import pagerank
from csv2parquet_spark.operators.text import shingles
from csv2parquet_spark.queries.registry import register
from csv2parquet_spark.tables import table


@register(
    "bpe_pair_counts",
    oracle="""
    SELECT pair, count(*) AS n FROM (
      SELECT t[i] || ' ' || t[i+1] AS pair
      FROM (SELECT string_split(text, ' ') AS t FROM documents),
           LATERAL (SELECT unnest(range(1, len(t))) AS i)
    )
    GROUP BY pair ORDER BY n DESC, pair LIMIT 100
    """,
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide adjacent-token-pair frequencies, top 100 — one
    merge-selection iteration of BPE/WordPiece tokenizer training.

    Pairs come from the O(n) zip_with shingle builder (no per-element
    slice allocation), then a partial-aggregated count and a
    TakeOrderedAndProject top-k — no global sort materializes. Full BPE
    training is this query in the driver loop of a merge table; each
    round is one map + one narrow-key shuffle.
    """
    d = table(spark, sf_dir, "documents")
    pairs = d.select(
        F.explode(shingles(F.split("text", " "), k=2)).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(100)
    )


@register(
    "inverted_index_postings",
    oracle="""
    WITH per AS (
      SELECT tok, doc_id, count(*) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      WHERE tok <> ''
      GROUP BY tok, doc_id
    ),
    stats AS (
      SELECT tok, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf
      FROM per GROUP BY tok
    ),
    top AS (
      SELECT tok, doc_id FROM (
        SELECT tok, doc_id,
               row_number() OVER (PARTITION BY tok ORDER BY doc_id) AS rn
        FROM per
      ) WHERE rn <= 20
    ),
    post AS (
      SELECT tok, string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
               AS postings
      FROM top GROUP BY tok
    )
    SELECT s.tok, s.df, s.cf, p.postings
    FROM stats s JOIN post p USING (tok)
    WHERE s.df >= 5
    """,
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index build: token -> (document frequency, collection
    frequency, first-20 postings) for tokens appearing in >= 5 docs.

    The postings list is rank-limited BEFORE collection (row_number
    over doc_id, then ``collect_list(when(rn <= 20))`` — collect_list
    skips the nulls), so per-token state is bounded even for
    stopword-grade tokens — a naive collect_list would gather a
    corpus-sized array for 'the' at 100 TB. Single corpus scan, two
    chained shuffles: (tok, doc_id) for the tf aggregate, then tok for
    the rank window, whose partitioning the final groupBy reuses with
    no further exchange; real engines shard longer postings by
    (tok, block) with exactly this topology.
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    per = toks.groupBy("tok", "doc_id").agg(F.count("*").alias("tf"))
    w = Window.partitionBy("tok").orderBy("doc_id")
    ranked = per.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("tok")
        .agg(
            F.count("*").alias("df"),
            F.sum("tf").alias("cf"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("rn") <= 20, F.col("doc_id"))
                        )
                    ),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings"),
        )
        .filter(F.col("df") >= 5)
        .select("tok", "df", "cf", "postings")
    )


@register("textrank_tokens", oracle=None)  # iterative float fixpoint → rows-only
def textrank_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank (Mihalcea & Tarau 2004): PageRank over the directed
    token-transition graph — top-50 tokens by stationary weight.

    Edges are distinct adjacent-token pairs (the bpe_pair_counts
    relation, deduplicated); 5 fixed power iterations with decimal-
    summed contributions make the output deterministic run-to-run (the
    rows-only gate re-executes and diffs). Not SQL-expressible without
    recursion, hence no oracle; determinism is the contract instead.
    """
    d = table(spark, sf_dir, "documents")
    edges = (
        d.select(F.explode(shingles(F.split("text", " "), k=2)).alias("pair"))
        .select(
            F.split_part("pair", F.lit(" "), F.lit(1)).alias("src"),
            F.split_part("pair", F.lit(" "), F.lit(2)).alias("dst"),
        )
        .filter((F.col("src") != "") & (F.col("dst") != ""))
    )
    ranks = pagerank(edges, damping=0.85, n_iter=5)
    return (
        ranks.orderBy(F.desc("rank"), "id")
        .limit(50)
        .select(F.col("id").alias("token"), "rank")
    )


__all__ = ["bpe_pair_counts", "inverted_index_postings", "textrank_tokens"]
