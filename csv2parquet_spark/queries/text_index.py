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

from csv2parquet_spark.operators.graph import pagerank_fixed
from csv2parquet_spark.operators.scan import parallelize_scan as _ps
from csv2parquet_spark.operators.text import shingles
from csv2parquet_spark.queries.llm_ops import _sql_cosine
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


def _textrank_oracle(n_iter: int = 5) -> str:
    """Chained-MATERIALIZED-CTE oracle for the FIXED-POINT PageRank
    (operators/graph.py:pagerank_fixed): every quantity is BIGINT in
    1e-12 units, damping 85/100 as integer multiply + floor divide, so
    both engines compute the identical integers — no float anywhere.
    sum() is CAST AS BIGINT everywhere (DuckDB widens to HUGEINT)."""
    parts = [
        """
    WITH toks AS MATERIALIZED (
      SELECT string_split(text, ' ') AS t FROM documents
    ), e AS MATERIALIZED (
      SELECT DISTINCT t[i] AS src, t[i+1] AS dst
      FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i)
      WHERE t[i] <> '' AND t[i+1] <> ''
    ), v AS MATERIALIZED (
      SELECT DISTINCT id FROM (SELECT src AS id FROM e UNION SELECT dst FROM e)
    ), deg AS MATERIALIZED (
      SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src
    ), p AS MATERIALIZED (
      SELECT CAST(count(*) AS BIGINT) AS n FROM v
    ), r0 AS MATERIALIZED (
      SELECT id, CAST(1000000000000 // p.n AS BIGINT) AS r FROM v, p
    )"""
    ]
    for t in range(1, n_iter + 1):
        parts.append(f"""
    , c{t} AS MATERIALIZED (
      SELECT e.dst AS id, CAST(sum(r.r // d.deg) AS BIGINT) AS inflow
      FROM e JOIN deg d ON d.src = e.src JOIN r{t - 1} r ON r.id = e.src
      GROUP BY e.dst
    ), dm{t} AS MATERIALIZED (
      SELECT CAST(coalesce(sum(r.r), 0) AS BIGINT) AS dm
      FROM r{t - 1} r WHERE r.id NOT IN (SELECT src FROM deg)
    ), r{t} AS MATERIALIZED (
      SELECT v.id,
             CAST((15 * 1000000000000) // (100 * p.n)
                  + (85 * (coalesce(c.inflow, 0) + m.dm // p.n)) // 100
                  AS BIGINT) AS r
      FROM v CROSS JOIN p CROSS JOIN dm{t} m
      LEFT JOIN c{t} c ON c.id = v.id
    )""")
    parts.append(f"""
    SELECT id AS token, r AS rank_fp FROM r{n_iter}
    ORDER BY r DESC, token LIMIT 50
    """)
    return "".join(parts)


@register("textrank_tokens", oracle=_textrank_oracle())
def textrank_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank (Mihalcea & Tarau 2004): PageRank over the directed
    token-transition graph — top-50 tokens by stationary weight.

    Edges are distinct adjacent-token pairs; 5 fixed power iterations
    of the FIXED-POINT integer recurrence (``pagerank_fixed`` —
    BIGINT ranks in 1e-12 units, damping as 85//100 integer ops),
    which is exact, associative, and portable — upgrading this query
    from the rows-only determinism check to a full hash match against
    a 5-level chained-CTE SQL oracle. The double-arithmetic
    :func:`~csv2parquet_spark.operators.graph.pagerank` stays the
    library's float variant (closed-form-pinned in tests); ranking
    agreement between the two is pinned by a unit test.
    """
    # gated rebalance BEFORE the token-pair explode (r11): the
    # single-file fixture scan otherwise runs the edge-build map on ONE
    # task; a no-op at scale (see parallelize_scan)
    d = _ps(table(spark, sf_dir, "documents").select("text"))
    edges = (
        d.select(F.explode(shingles(F.split("text", " "), k=2)).alias("pair"))
        .select(
            F.split_part("pair", F.lit(" "), F.lit(1)).alias("src"),
            F.split_part("pair", F.lit(" "), F.lit(2)).alias("dst"),
        )
        .filter((F.col("src") != "") & (F.col("dst") != ""))
    )
    ranks = pagerank_fixed(edges, n_iter=5)
    return (
        ranks.orderBy(F.desc("rank_fp"), "id")
        .limit(50)
        .select(F.col("id").alias("token"), "rank_fp")
    )


__all__ = ["bpe_pair_counts", "inverted_index_postings", "textrank_tokens"]


# BM25 scoring pipeline as a reusable oracle fragment (shared by
# bm25_topk_docs and rrf_fusion_hybrid — the fused query must rank the
# SAME sparse scores).
_BM25_SQL_CTES = """
    tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ), dl AS (
      SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id
    ), stats AS (
      SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
      FROM dl
    ), tf AS (
      SELECT doc_id, t, count(*) AS tf FROM tok
      WHERE t IN ('spark', 'shuffle', 'broadcast') GROUP BY doc_id, t
    ), df AS (
      SELECT t, count(*) AS df FROM tf GROUP BY t
    ), scored AS (
      SELECT tf.doc_id,
             CAST(ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
                  * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl))
                  AS DECIMAL(18,10)) AS term_score
      FROM tf JOIN df USING (t) JOIN dl USING (doc_id), stats
    ), sparse AS (
      SELECT doc_id, round(CAST(sum(term_score) AS DOUBLE), 6) AS bm25
      FROM scored GROUP BY doc_id
      ORDER BY sum(term_score) DESC, doc_id LIMIT 20
    )
"""


def _bm25_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of the ``sparse`` CTE: BM25 (k1=1.2, b=0.75) top-20
    for the fixed 3-term query, ``(doc_id, bm25)`` with bm25 rounded at
    6 dp. See :func:`bm25_topk_docs` for the parity discipline."""
    terms = ["spark", "shuffle", "broadcast"]
    docs = table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
    # checkpointed: consumed three times (N/avgdl scalars, the scoring
    # join) — per-doc sized, and pinning it avoids re-exploding the
    # corpus for each consumer
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl")).localCheckpoint()
    n, sum_dl = dl.agg(F.count(F.lit(1)), F.sum("dl")).collect()[0]
    avgdl = float(sum_dl) / n  # same IEEE division as the oracle
    tf = (
        tok.filter(F.col("t").isin(terms))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log((F.lit(float(n)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    term_score = (
        idf
        * F.col("tf")
        / (F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dl") / F.lit(avgdl)))
    ).cast("decimal(18,10)")
    scored = (
        tf.join(F.broadcast(df), "t")
        .join(dl, "doc_id")
        .select("doc_id", term_score.alias("term_score"))
    )
    agg = scored.groupBy("doc_id").agg(F.sum("term_score").alias("s"))
    return (
        agg.orderBy(F.desc("s"), "doc_id")
        .limit(20)
        .select("doc_id", F.round(F.col("s").cast("double"), 6).alias("bm25"))
    )


@register(
    "bm25_topk_docs",
    oracle=f"""
    WITH {_BM25_SQL_CTES}
    SELECT doc_id, bm25 FROM sparse
    """,
)
def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval (Robertson/Okapi, k1=1.2, b=0.75) for a fixed
    3-term query over the corpus — the lexical-retrieval half of a
    two-stage RAG pipeline (the ANN queries are the dense half). Model
    stats (df per term, N, avgdl) are partial-agg scalars; scoring
    touches only docs containing a query term (the tf relation, not the
    corpus); top-20 is TakeOrderedAndProject.

    Parity: every per-term score is a deterministic double expression
    of integer (tf, dl, df, N) and one shared double (avgdl — the same
    division on both engines), decimal-cast BEFORE the per-doc sum so
    association order can't drift, rounded at 6 dp; ORDER BY the exact
    decimal sum with a doc_id tiebreak."""
    return _bm25_top20(spark, sf_dir)


def _rank_by_count(
    df: DataFrame, score_col: str, id_col: str, out_id: str, out_rank: str
) -> DataFrame:
    """1-based rank by (score DESC, id ASC) over a MODEL-SIZED relation
    (top-k lists, k≤~100) without a Window: rank = 1 + number of rows
    strictly ahead, via a broadcast self-join. k×k comparisons on k
    rows — constant work regardless of corpus size, and no
    single-partition sort stage anywhere."""
    a = df.select(F.col(id_col).alias("__ia"), F.col(score_col).alias("__sa"))
    b = df.select(F.col(id_col).alias("__ib"), F.col(score_col).alias("__sb"))
    ahead = (F.col("__sb") > F.col("__sa")) | (
        (F.col("__sb") == F.col("__sa")) & (F.col("__ib") < F.col("__ia"))
    )
    return (
        a.join(F.broadcast(b), ahead, "left")
        .groupBy("__ia")
        .agg((F.count("__ib") + 1).cast("long").alias(out_rank))
        .select(F.col("__ia").alias(out_id), out_rank)
    )


@register(
    "rrf_fusion_hybrid",
    oracle=f"""
    WITH {_BM25_SQL_CTES},
    srank AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT)
               AS rank_sparse
      FROM sparse
    ), dense AS (
      SELECT b.vec_id AS doc_id,
             round({_sql_cosine('b.embedding', 'q.embedding')}, 6) AS sim
      FROM embeddings b, (SELECT embedding FROM embeddings
                          WHERE vec_id = 0 AND embedding IS NOT NULL) q
      WHERE b.vec_id <> 0 AND b.embedding IS NOT NULL
      ORDER BY sim DESC, b.vec_id LIMIT 20
    ), drank AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY sim DESC, doc_id) AS BIGINT)
               AS rank_dense
      FROM dense
    )
    SELECT coalesce(d.doc_id, s.doc_id) AS doc_id,
           d.rank_dense, s.rank_sparse,
           CAST(CASE WHEN d.rank_dense IS NOT NULL
                      AND s.rank_sparse IS NOT NULL
                     THEN 120 + d.rank_dense + s.rank_sparse
                     ELSE 1 END AS BIGINT) AS rrf_num,
           CAST(coalesce(60 + d.rank_dense, 1)
                * coalesce(60 + s.rank_sparse, 1) AS BIGINT) AS rrf_den
    FROM drank d FULL JOIN srank s ON d.doc_id = s.doc_id
    """,
)
def rrf_fusion_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval fusion — Reciprocal Rank Fusion (Cormack et al.
    2009) of the lexical BM25 top-20 and the dense cosine top-20 for
    the same information need (query vec_id=0 / the fixed 3-term query).
    The standard two-retriever RAG merge: RRF(d) = Σ 1/(60 + rank_r(d)).

    Engine-exactness: RRF depends only on RANKS, so the float retrieval
    scores never enter the output — the fused score is emitted as the
    exact integer fraction ``rrf_num/rrf_den`` (both retrievers:
    (120+ra+rb)/((60+ra)(60+rb)); one retriever: 1/(60+r)), making the
    hash check bite on pure BIGINT arithmetic.

    Scale shape: each retriever is its own scale-safe pipeline (BM25:
    partial-agg model stats + TakeOrdered; dense: broadcast query ×
    scan + TakeOrdered); ranking and fusion then operate on two
    MODEL-SIZED top-k relations — rank-by-count broadcast self-joins
    (k², k=20) and a tiny full-outer merge. At 100 TB only the two
    retrieval scans touch data; fusion cost is O(k²) regardless.
    """
    from csv2parquet_spark.operators.similarity import topk_similar

    sparse = _bm25_top20(spark, sf_dir).localCheckpoint()
    # NULL contract (r11): a NULL vector can neither be queried nor
    # retrieved — filtered on both sides of the dense retriever and
    # mirrored in the oracle (with a NULL query the dense leg is empty
    # and fusion degrades to sparse-only ranks, identically).
    e = table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    q = e.filter(F.col("vec_id") == 0).select("embedding")
    dense = (
        topk_similar(e.filter(F.col("vec_id") != 0), q, k=20)
        .localCheckpoint()
    )
    srank = _rank_by_count(sparse, "bm25", "doc_id", "doc_id", "rank_sparse")
    drank = _rank_by_count(dense, "sim", "vec_id", "doc_id", "rank_dense")
    ra, rb = F.col("rank_dense"), F.col("rank_sparse")
    return drank.join(srank, "doc_id", "full").select(
        "doc_id",
        "rank_dense",
        "rank_sparse",
        F.when(ra.isNotNull() & rb.isNotNull(), 120 + ra + rb)
        .otherwise(F.lit(1))
        .cast("long")
        .alias("rrf_num"),
        (F.coalesce(ra + 60, F.lit(1)) * F.coalesce(rb + 60, F.lit(1)))
        .cast("long")
        .alias("rrf_den"),
    )


@register(
    "pmi_collocations",
    oracle="""
    WITH tok AS (
      SELECT string_split(text, ' ') AS arr FROM documents
    ), bg AS (
      SELECT arr[i] AS w1, arr[i + 1] AS w2
      FROM tok, LATERAL (SELECT unnest(range(1, len(arr))) AS i) _l
      WHERE len(arr) > 1
    ), c2 AS (
      SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2
    ), cl AS (
      SELECT w1, sum(c2) AS cl FROM c2 GROUP BY w1
    ), cr AS (
      SELECT w2, sum(c2) AS cr FROM c2 GROUP BY w2
    ), t AS (
      SELECT sum(c2) AS t FROM c2
    )
    SELECT c2.w1, c2.w2, CAST(c2.c2 AS BIGINT) AS pair_count,
           round(ln(CAST(c2.c2 AS DOUBLE) * t.t
                    / (CAST(cl.cl AS DOUBLE) * cr.cr)), 6) AS pmi
    FROM c2 JOIN cl USING (w1) JOIN cr USING (w2), t
    WHERE c2.c2 >= 5
    ORDER BY pmi DESC, c2.w1, c2.w2
    LIMIT 20
    """,
)
def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top-20 adjacent token pairs by pointwise
    mutual information, PMI = ln(c(w1,w2)·T / (c(w1,·)·c(·,w2))), with
    a min-support floor of 5 — the phrase-detection pass (word2vec
    phrases, n-gram vocab induction) a tokenizer pipeline runs before
    committing multi-token units.

    Scale shape: bigrams build MAP-SIDE (array zipped against its own
    tail, explode — no join), ONE corpus scan; the model is the
    pair-count relation, checkpointed so left-marginals,
    right-marginals and the grand total all derive from it (three
    model-sized aggs, zero corpus re-scans). Integer counts until the
    single ln() argument, computed as (double·double)/(double·double)
    in the same association order on both engines; min-support kills
    the low-count noise PMI is notorious for. Top-20 is
    TakeOrderedAndProject over the model relation.
    """
    docs = table(spark, sf_dir, "documents")
    arr = F.split("text", " ")
    n1 = F.greatest(F.size(arr) - 1, F.lit(0))
    bg = docs.select(
        F.explode(
            F.arrays_zip(
                F.slice(arr, 1, n1).alias("w1"), F.slice(arr, 2, n1).alias("w2")
            )
        ).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    c2 = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
        .localCheckpoint()
    )
    cl = c2.groupBy("w1").agg(F.sum("c2").alias("cl"))
    cr = c2.groupBy("w2").agg(F.sum("c2").alias("cr"))
    t = int(c2.agg(F.sum("c2")).collect()[0][0])  # 1 scalar to the driver
    scored = (
        c2.filter(F.col("c2") >= 5)
        .join(cl, "w1")
        .join(cr, "w2")
        .select(
            "w1",
            "w2",
            F.col("c2").alias("pair_count"),
            F.round(
                F.log(
                    F.col("c2").cast("double")
                    * F.lit(t)
                    / (F.col("cl").cast("double") * F.col("cr"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), "w1", "w2").limit(20)


def _mmr_oracle(k: int = 8, n_cand: int = 50) -> str:
    """Generate the chained-CTE DuckDB twin of the MMR selection loop:
    one MATERIALIZED CTE level per pick (DuckDB inlines CTEs — without
    MATERIALIZED the growing NOT IN/greedy chain goes exponential)."""
    cos_q = _sql_cosine("e.embedding", "q.embedding")
    cos_p = _sql_cosine("ea.embedding", "eb.embedding")
    sql = f"""
    WITH cand AS MATERIALIZED (
      SELECT e.vec_id AS doc_id,
             CAST(round({cos_q} * 10000) AS BIGINT) AS rel_fp
      FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
      WHERE e.vec_id <> 0
      ORDER BY rel_fp DESC, doc_id LIMIT {n_cand}
    ), pairs AS MATERIALIZED (
      SELECT ca.doc_id AS a, cb.doc_id AS b,
             CAST(round({cos_p} * 10000) AS BIGINT) AS sim_fp
      FROM cand ca JOIN embeddings ea ON ea.vec_id = ca.doc_id,
           cand cb JOIN embeddings eb ON eb.vec_id = cb.doc_id
      WHERE ca.doc_id <> cb.doc_id
    ), sel1 AS MATERIALIZED (
      SELECT CAST(1 AS BIGINT) AS pick_rank, doc_id, rel_fp,
             CAST(NULL AS BIGINT) AS max_sim_fp, rel_fp AS mmr2
      FROM cand ORDER BY rel_fp DESC, doc_id LIMIT 1
    ), selall1 AS MATERIALIZED (SELECT * FROM sel1)
    """
    for t in range(2, k + 1):
        sql += f"""
    , sel{t} AS MATERIALIZED (
      SELECT CAST({t} AS BIGINT) AS pick_rank, doc_id, rel_fp,
             max_sim_fp, rel_fp - max_sim_fp AS mmr2
      FROM (
        SELECT c.doc_id, c.rel_fp,
               (SELECT max(p.sim_fp) FROM pairs p
                 WHERE p.a = c.doc_id
                   AND p.b IN (SELECT doc_id FROM selall{t - 1})) AS max_sim_fp
        FROM cand c
        WHERE c.doc_id NOT IN (SELECT doc_id FROM selall{t - 1})
      )
      ORDER BY mmr2 DESC, doc_id LIMIT 1
    ), selall{t} AS MATERIALIZED (
      SELECT * FROM selall{t - 1} UNION ALL SELECT * FROM sel{t}
    )
    """
    sql += f"""
    SELECT pick_rank, doc_id, rel_fp, max_sim_fp, mmr2 FROM selall{k}
    """
    return sql


@register("mmr_diversify_topk", oracle=_mmr_oracle())
def mmr_diversify_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance (Carbonell & Goldstein 1998)
    diversified top-8 for query vec_id=0: greedily pick the candidate
    maximizing λ·rel − (1−λ)·max-sim-to-already-picked, λ=0.5 — the
    standard de-redundancy re-rank between retrieval and a RAG prompt
    (near-duplicate passages waste context tokens).

    Engine-exactness: relevance and pairwise similarity are cosines
    rounded to 1e-4 fixed-point BIGINTs (identical doubles on both
    engines via the proven sequential-fold pairing, identical
    away-from-zero rounding); with λ=0.5 the argmax of
    (rel − max_sim)/2 equals the argmax of the INTEGER ``mmr2 = rel_fp
    − max_sim_fp``, ties to lower id — so every greedy pick is a pure
    integer decision and the whole trajectory is deterministic.

    Scale shape: ONE corpus-touching stage (broadcast query × scan →
    TakeOrdered top-50); everything after operates on the model-sized
    candidate set — a 50×50 pair-sim relation computed once in Spark
    (bit-identity of the cosine fold with the oracle) and then COLLECTED
    along with the 50 candidate scores, after which the greedy argmax
    loop runs driver-side over pure integers (r11 optimization: the loop
    was 8 sequential filter+agg+collect Spark jobs over ≤2500-row
    relations — per-pick scheduler/py4j round-trips dominated the key;
    the candidate set is model-sized BY CONSTRUCTION, the same contract
    as the kmeans/IVF centroid collects, so the collect moves ≤2500
    integer triples and every pick is the same (mmr2, doc_id) integer
    argmax as before — identical trajectory, identical output). The
    corpus is scanned exactly once regardless of k.
    """
    from csv2parquet_spark.operators.similarity import dot, norm

    k, n_cand = 8, 50
    e = table(spark, sf_dir, "embeddings")
    q = F.broadcast(
        e.filter(F.col("vec_id") == 0).select(
            F.col("embedding").alias("qv"), norm(F.col("embedding")).alias("qn")
        )
    )
    rel_fp = F.round(
        dot(F.col("embedding"), F.col("qv"))
        / (norm(F.col("embedding")) * F.col("qn"))
        * 10000
    ).cast("long")
    cand = (
        # NULL embeddings are un-rankable by contract (the kmeans
        # NULL-twin rule): without the filter a NULL vector that
        # reached the top-50 would surface as None rel_fp/sim_fp and
        # TypeError in the driver-side argmax (ADVICE r11). The
        # fixtures carry zero NULL embeddings, so output and hash are
        # unchanged; NULLs sorted last and never ranked before either.
        e.filter(F.col("vec_id") != 0)
        .filter(F.col("embedding").isNotNull())
        .crossJoin(q)
        .select(F.col("vec_id").alias("doc_id"), rel_fp.alias("rel_fp"), "embedding")
        .orderBy(F.desc("rel_fp"), "doc_id")
        .limit(n_cand)
        .localCheckpoint()
    )
    ca = cand.select(
        F.col("doc_id").alias("a"), F.col("embedding").alias("ea")
    )
    cb = cand.select(
        F.col("doc_id").alias("b"), F.col("embedding").alias("eb")
    )
    sim_fp = F.round(
        dot(F.col("ea"), F.col("eb"))
        / (norm(F.col("ea")) * norm(F.col("eb")))
        * 10000
    ).cast("long")
    # Two model-sized collects replace the per-pick Spark jobs: the
    # n_cand scores and the n_cand² pairwise sims (integers computed by
    # the SAME Spark cosine fold as before — only the greedy argmax
    # moved to the driver). No checkpoint needed: each relation is
    # consumed exactly once.
    pairs_rows = (
        ca.join(F.broadcast(cb), F.col("a") != F.col("b"))
        .select("a", "b", sim_fp.alias("sim_fp"))
        .collect()
    )
    sim = {(r["a"], r["b"]): r["sim_fp"] for r in pairs_rows}
    scores = [
        (r["doc_id"], r["rel_fp"])
        for r in cand.select("doc_id", "rel_fp").collect()
    ]

    # First pick: max rel_fp, ties to the lower doc_id (the old
    # orderBy(desc(rel_fp), doc_id).limit(1)).
    first_id, first_rel = min(scores, key=lambda s: (-s[1], s[0]))
    picked = [
        (1, first_id, first_rel, None, first_rel)
    ]  # (pick_rank, doc_id, rel_fp, max_sim_fp, mmr2)
    chosen = [first_id]
    for t in range(2, k + 1):
        # max sim to any already-picked doc, then argmax of the INTEGER
        # mmr2 = rel_fp - max_sim_fp with ties to the lower doc_id —
        # the exact join/groupBy/orderBy decision chain, on the same
        # integers.
        best = min(
            (
                (doc_id, rel_fp, max(sim[(doc_id, c)] for c in chosen))
                for doc_id, rel_fp in scores
                if doc_id not in chosen
            ),
            key=lambda s: (-(s[1] - s[2]), s[0]),
        )
        picked.append((t, best[0], best[1], best[2], best[1] - best[2]))
        chosen.append(best[0])
    from csv2parquet_spark.queries.helpers import local_result_df

    return local_result_df(
        spark,
        picked,
        "pick_rank bigint, doc_id bigint, rel_fp bigint, "
        "max_sim_fp bigint, mmr2 bigint",
    )


@register(
    "zipf_fit_tokens",
    oracle="""
    WITH tc AS (
      SELECT t, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
      WHERE t <> '' GROUP BY t
    ), top AS (
      SELECT t, c FROM tc ORDER BY c DESC, t LIMIT 100
    ), ranked AS (
      SELECT ln(CAST(row_number() OVER (ORDER BY c DESC, t) AS DOUBLE)) AS x,
             ln(CAST(c AS DOUBLE)) AS y
      FROM top
    ), sl AS (
      SELECT (b.y - a.y) / (b.x - a.x) AS s
      FROM ranked a JOIN ranked b ON a.x < b.x
    ), sg AS (
      SELECT s, CAST(count(*) AS BIGINT) AS cnt FROM sl GROUP BY s
    ), scdf AS (
      SELECT s, cnt,
             sum(cnt) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) AS cum,
             sum(cnt) OVER () AS n
      FROM sg
    ), med AS (
      SELECT (sum(CASE WHEN cum - cnt < (n+1)//2 AND (n+1)//2 <= cum
                       THEN s END)
              + sum(CASE WHEN cum - cnt < (n+2)//2 AND (n+2)//2 <= cum
                         THEN s END)) / 2 AS slope,
             CAST(max(n) AS BIGINT) AS n_pairs
      FROM scdf
    ), rs AS (
      SELECT ranked.y - med.slope * ranked.x AS r, med.slope, med.n_pairs
      FROM ranked, med
    ), rg AS (
      SELECT r, slope, n_pairs, CAST(count(*) AS BIGINT) AS cnt
      FROM rs GROUP BY r, slope, n_pairs
    ), rcdf AS (
      SELECT r, slope, n_pairs, cnt,
             sum(cnt) OVER (ORDER BY r ROWS UNBOUNDED PRECEDING) AS cum,
             sum(cnt) OVER () AS n
      FROM rg
    )
    SELECT CAST(max(n) AS BIGINT) AS n_tokens,
           max(n_pairs) AS n_pairs,
           round(max(slope), 6) AS zipf_slope,
           round((sum(CASE WHEN cum - cnt < (n+1)//2 AND (n+1)//2 <= cum
                           THEN r END)
                  + sum(CASE WHEN cum - cnt < (n+2)//2 AND (n+2)//2 <= cum
                             THEN r END)) / 2, 6) AS zipf_intercept
    FROM rcdf
    """,
)
def zipf_fit_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus token-frequency distribution:
    Theil-Sen slope of ln(frequency) against ln(rank) over the top-100
    tokens — natural text sits near slope −1; a synthetic or
    template-heavy corpus shows up immediately as a flat or broken
    power law. The corpus-statistics health check next to
    token_entropy_quality.

    Robust fit by construction (median of pairwise slopes — one
    boilerplate mega-token can't bend it). Parity: ranks are integers
    (count desc, token tiebreak both engines), ln of integers is
    deterministic, each pairwise slope one double division, both
    medians via the compressed-CDF k-th picks. Scale shape: one
    map-combining token count + TakeOrdered(100); everything after is
    100-point / 4950-pair model-sized math.
    """
    from csv2parquet_spark.operators.ranking import exact_median

    docs = table(spark, sf_dir, "documents")
    tc = (
        docs.select(F.explode(F.split("text", " ")).alias("t"))
        .filter(F.col("t") != "")
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top = tc.orderBy(F.desc("c"), "t").limit(100).localCheckpoint()
    ranked = _rank_by_count(top, "c", "t", "tok", "rank").join(
        top.select(F.col("t").alias("tok"), "c"), "tok"
    ).select(
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("c").cast("double")).alias("y"),
    ).localCheckpoint()
    a = ranked.select(F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = ranked.select(F.col("x").alias("xb"), F.col("y").alias("yb"))
    sl = a.join(F.broadcast(b), F.col("xa") < F.col("xb")).select(
        ((F.col("yb") - F.col("ya")) / (F.col("xb") - F.col("xa"))).alias("s")
    )
    slope, n_pairs = exact_median(sl, "s")
    res = ranked.select(
        (F.col("y") - F.lit(slope) * F.col("x")).alias("r")
    )
    intercept, n_tokens = exact_median(res, "r")
    from csv2parquet_spark.queries.helpers import local_result_df

    return local_result_df(
        spark,
        [(n_tokens, n_pairs, round(slope, 6), round(intercept, 6))],
        "n_tokens bigint, n_pairs bigint, zipf_slope double, "
        "zipf_intercept double",
    )
