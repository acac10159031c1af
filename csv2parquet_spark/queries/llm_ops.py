"""LLM-data-pipeline queries (SURVEY.md §2.8): dedup (exact, MinHash-LSH,
SimHash, n-gram Jaccard, embedding-cosine), similarity search (exact
top-k, LSH approx), text analysis (token stats, quality, language-ID,
fingerprints), multimodal binary columns.

Oracle SQL uses DuckDB list lambdas for the vector math, computed in
DOUBLE with a sequential fold to mirror Spark's ``F.aggregate`` exactly
(DuckDB's native ``list_cosine_similarity`` is float32 — not used).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from csv2parquet_spark.operators import dedup as D
from csv2parquet_spark.operators import scan as SCAN
from csv2parquet_spark.operators import similarity as S
from csv2parquet_spark.operators import text as T
from csv2parquet_spark.queries.helpers import sql_davg, sql_dsum
from csv2parquet_spark.queries.registry import register
from csv2parquet_spark.tables import table

# DuckDB-side double-precision cosine (sequential fold like F.aggregate).
_SQL_DOT = (
    "list_sum(list_transform(range(1, len({a}) + 1), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)


def _sql_cosine(a: str, b: str) -> str:
    dot = _SQL_DOT.format(a=a, b=b)
    na = f"sqrt({_SQL_DOT.format(a=a, b=a)})"
    nb = f"sqrt({_SQL_DOT.format(a=b, b=b)})"
    return f"({dot} / ({na} * {nb}))"


def _sql_lsh_bucket(vec: str, planes: list[list[float]]) -> str:
    """DuckDB twin of similarity._lsh_bucket_col: sign-bit bucket against
    the SAME literal hyperplanes (repr() roundtrips the doubles)."""
    terms = []
    for p, plane in enumerate(planes):
        lit = "[" + ", ".join(repr(v) for v in plane) + "]"
        dot = (
            f"list_sum(list_transform(range(1, len({vec}) + 1), "
            f"i -> CAST({vec}[i] AS DOUBLE) * ({lit})[i]))"
        )
        terms.append(f"CASE WHEN {dot} >= 0 THEN {1 << p} ELSE 0 END")
    return "(" + " + ".join(terms) + ")"


# embedding_near_dups LSH-blocking config: 4 planes × 8 tables ≈ 75%
# recall of the fixture's ~0.45-cosine pairs with a 2.4× candidate cut
# (higher thresholds at scale → more planes; the label-blocked variant
# this replaces found only 5 of 59 true pairs at sf0.01).
_ND_PLANES, _ND_TABLES = 4, 8
_ND_BK_COLS = ",\n           ".join(
    f"{_sql_lsh_bucket('embedding', S._hyperplanes(_ND_PLANES, 64, 42 + t))} AS b{t}"
    for t in range(_ND_TABLES)
)
_ND_BK_MATCH = " OR ".join(f"a.b{t} = b.b{t}" for t in range(_ND_TABLES))


# --------------------------------------------------------------------------
# Deduplication
# --------------------------------------------------------------------------
@register(
    "dedup_exact",
    oracle="""
    SELECT min(doc_id) AS keep_id, count(*) AS n_copies, md5(text) AS fp
    FROM documents
    GROUP BY md5(text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via text-hash groupBy — the shuffle moves 16-byte
    hashes, never document bodies (the 100 TB-safe shape)."""
    return D.exact_dedup(table(spark, sf_dir, "documents"))


@register(
    "dedup_keep_first_counts",
    oracle="""
    SELECT lang, count(*) AS n_kept FROM (
      SELECT lang, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
      FROM documents
    ) WHERE rn = 1 GROUP BY lang
    """,
)
def dedup_keep_first_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-based keep-first dedup, summarized per language."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("text").orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("lang")
        .agg(F.count("*").alias("n_kept"))
    )


@register(
    "ngram_jaccard_near_dups",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
      FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i)
    ), sz AS (
      SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
    ), common AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, common, sa.sz AS sz_a, sb.sz AS sz_b,
           round(CAST(common AS DOUBLE) / (sa.sz + sb.sz - common), 6) AS jaccard
    FROM common JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
    WHERE round(CAST(common AS DOUBLE) / (sa.sz + sb.sz - common), 6) >= 0.8
    """,
)
def ngram_jaccard_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs (threshold 0.8) — the
    blocking self-join on shingles bounds the pair space. Uses the
    hash prefix order (zero extra shuffles; ~2× faster than rare-first
    on this corpus's near-uniform shingle frequencies — rare-first
    stays the operator default for heavy-tailed real text)."""
    return D.ngram_jaccard_pairs(
        table(spark, sf_dir, "documents"), threshold=0.8, order="hash"
    )


_MH_SALTS = ("a", "b")  # 2 md5 calls × 4 slices = 8 permutations


def _minhash_md5_oracle() -> str:
    mins = [
        f"CAST(min(CAST(('0x' || substr(md5('{salt}:' || s), {1 + 8 * k}, 8)) AS BIGINT)) AS VARCHAR)"
        for salt in _MH_SALTS
        for k in range(4)
    ]
    sig = " || ',' || ".join(mins)
    return f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), sh AS (
      SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
      FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i)
    )
    SELECT doc_id, {sig} AS sig
    FROM sh GROUP BY doc_id
    """


@register("minhash_signatures_md5", oracle=_minhash_md5_oracle())
def minhash_signatures_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures with ENGINE-REPRODUCIBLE hashes: 8
    permutations from the 4 disjoint 32-bit md5 slices of two salted
    hashes per shingle (the same md5-slice trick the CMS/HLL/Bloom
    oracles use) — upgrading the MinHash surface from the xxhash64
    variant's rows-only check to a full hash match. Scale shape is the
    production one: shingle explode is map-side, the min-aggregation is
    partial (each partition collapses to 8 longs per doc before the
    shuffle), so signature construction over 100 TB shuffles 8 longs
    per document. The xxhash64 implementation (dedup.py) stays the
    fast path; this query pins the algorithm end-to-end against SQL."""
    from csv2parquet_spark.operators.text import shingles, tokens

    docs = table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", F.explode(shingles(tokens("text"), 3)).alias("s")
    )
    hashes = [
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{salt}:"), F.col("s"))), 1 + 8 * k, 8),
            16,
            10,
        ).cast("long")
        for salt in _MH_SALTS
        for k in range(4)
    ]
    return (
        sh.groupBy("doc_id")
        .agg(*[F.min(h).alias(f"m{i}") for i, h in enumerate(hashes)])
        .select(
            "doc_id",
            F.concat_ws(",", *[f"m{i}" for i in range(8)]).alias("sig"),
        )
    )


def _minhash_lsh_oracle() -> str:
    """End-to-end MinHash-LSH oracle: md5-slice signatures → 4 band
    tuples (2 mins each) → band-sharing candidate pairs → exact Jaccard
    ≥ 0.8. Mirrors the proven ``minhash_signatures_md5`` min
    construction and the proven ``ngram_jaccard_near_dups`` verify
    tail."""
    # Mins over the HEX SLICES THEMSELVES (fixed-width lowercase hex →
    # lexicographic min == numeric min): the sig values only ever feed
    # band keys, so the int parse (Spark conv / DuckDB '0x' cast) is
    # pure overhead. All 8 permutations come from ONE md5 call (8
    # disjoint 16-bit slices): narrower per-perm hashes add a few
    # min-collision false candidates, which the exact-Jaccard verify
    # rejects — and halving the md5 work took the sf0.1 query from
    # 2.4 s to 1.1 s, under the xxhash64 variant's 1.4 s.
    mins = [
        f"min(substr(md5(s), {1 + 4 * j}, 4)) AS m{j}" for j in range(8)
    ]
    band_keys = " ".join(
        f"WHEN {b} THEN m{2 * b} || ',' || m{2 * b + 1}" for b in range(4)
    )
    return f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), sh AS MATERIALIZED (
      SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
      FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i)
    ), mins AS MATERIALIZED (
      SELECT doc_id, {", ".join(mins)} FROM sh GROUP BY doc_id
    ), bands AS MATERIALIZED (
      SELECT doc_id, b.band, CASE b.band {band_keys} END AS key
      FROM mins, (VALUES (0), (1), (2), (3)) AS b(band)
    ), cand AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
      FROM bands a JOIN bands c
        ON a.band = c.band AND a.key = c.key AND a.doc_id < c.doc_id
    ), sz AS (
      SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
    ), common AS (
      SELECT p.id_a, p.id_b, count(*) AS common
      FROM cand p
      JOIN sh a ON a.doc_id = p.id_a
      JOIN sh b2 ON b2.doc_id = p.id_b AND b2.s = a.s
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, common, sa.sz AS sz_a, sb.sz AS sz_b,
           round(CAST(common AS DOUBLE) / (sa.sz + sb.sz - common), 6) AS jaccard
    FROM common JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
    WHERE CAST(common AS DOUBLE) / (sa.sz + sb.sz - common) >= 0.8
    """


@register("minhash_near_dups", oracle=_minhash_lsh_oracle())
def minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH banding + exact-Jaccard verify, END-TO-END
    hash-checkable: 8 permutations = 8 disjoint 16-bit slices of ONE
    md5 per shingle (the md5-slice trick of the proven
    ``minhash_signatures_md5``, narrowed so one hash call feeds every
    perm — see ``_minhash_lsh_oracle``), 4 collision-free band TUPLES
    (2 mins each), candidates = pairs agreeing on some band, verified
    with exact Jaccard ≥ 0.8. Upgraded from the xxhash64 rows-only
    variant — same operator pipeline (``minhash_lsh_candidates`` +
    ``_verify_jaccard``), reproducible hash family, so the whole LSH
    algorithm is proven against SQL, not just the signature step. The
    xxhash64 + Arrow-kernel variant remains the library default and
    throughput path (bit-identity + scale smoke pinned in
    tests/test_operators.py and tests/test_scale_smoke.py)."""
    hashers = [
        (lambda j: (lambda s: F.substring(F.md5(s), 1 + 4 * j, 4)))(j)
        for j in range(8)
    ]
    return D.minhash_near_dups_exprs(
        table(spark, sf_dir, "documents"), hashers, threshold=0.8, bands=4
    )


def _minhash_recall_oracle() -> str:
    """Recall/precision audit oracle: the md5-slice LSH candidate CTEs
    (same construction as ``_minhash_lsh_oracle``) measured against the
    exact 3-gram-Jaccard ground truth (same form as the
    ``ngram_jaccard_near_dups`` oracle), reduced to integer counts and
    ppm ratios — no floats in the hashed output."""
    mins = [f"min(substr(md5(s), {1 + 4 * j}, 4)) AS m{j}" for j in range(8)]
    band_keys = " ".join(
        f"WHEN {b} THEN m{2 * b} || ',' || m{2 * b + 1}" for b in range(4)
    )
    return f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), sh AS MATERIALIZED (
      SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
      FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i)
    ), mins AS MATERIALIZED (
      SELECT doc_id, {", ".join(mins)} FROM sh GROUP BY doc_id
    ), bands AS MATERIALIZED (
      SELECT doc_id, b.band, CASE b.band {band_keys} END AS key
      FROM mins, (VALUES (0), (1), (2), (3)) AS b(band)
    ), cand AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
      FROM bands a JOIN bands c
        ON a.band = c.band AND a.key = c.key AND a.doc_id < c.doc_id
    ), sz AS MATERIALIZED (
      SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
    ), common AS MATERIALIZED (
      SELECT a.doc_id AS id_a, b2.doc_id AS id_b, count(*) AS common
      FROM sh a JOIN sh b2 ON a.s = b2.s AND a.doc_id < b2.doc_id
      GROUP BY 1, 2
    ), truth AS MATERIALIZED (
      SELECT id_a, id_b
      FROM common JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
      WHERE round(CAST(common AS DOUBLE) / (sa.sz + sb.sz - common), 6) >= 0.8
    ), hits AS MATERIALIZED (
      SELECT cand.id_a FROM cand JOIN truth
        ON cand.id_a = truth.id_a AND cand.id_b = truth.id_b
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_truth,
           (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_candidates,
           (SELECT CAST(count(*) AS BIGINT) FROM hits) AS n_hits,
           CAST((SELECT count(*) FROM hits) * 1000000
                // greatest((SELECT count(*) FROM truth), 1) AS BIGINT)
             AS recall_ppm,
           CAST((SELECT count(*) FROM hits) * 1000000
                // greatest((SELECT count(*) FROM cand), 1) AS BIGINT)
             AS precision_ppm
    """


@register("minhash_recall_audit", oracle=_minhash_recall_oracle())
def minhash_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-quality audit: recall AND precision of the MinHash-LSH
    CANDIDATE set against exact 3-gram-Jaccard ≥ 0.8 ground truth —
    the measurement that justifies running the sketch instead of the
    exact PPJoin at 100 TB (and the knob-tuning loop for bands/perms).

    Reuses both proven pipelines as-is:
    :func:`~csv2parquet_spark.operators.dedup.minhash_candidates_exprs`
    (the md5-slice family of the hash-proven minhash_near_dups, pre-
    verify) and ``ngram_jaccard_pairs`` (the hash-proven exact PPJoin).
    Both pair sets are corpus-bounded (prefix-filter / band-bucketed,
    never all-pairs); the audit adds one pair-keyed join plus three
    1-row aggregates, so it costs what the two pipelines cost. Output
    is one row of integer counts + ppm ratios (count·10^6 DIV total) —
    no float division in the hash."""
    docs = table(spark, sf_dir, "documents")
    hashers = [
        (lambda j: (lambda s: F.substring(F.md5(s), 1 + 4 * j, 4)))(j)
        for j in range(8)
    ]
    cand = D.minhash_candidates_exprs(docs, hashers, bands=4).localCheckpoint()
    truth = (
        D.ngram_jaccard_pairs(docs, threshold=0.8, order="hash")
        .select("id_a", "id_b")
        .localCheckpoint()
    )
    hits = cand.join(truth, ["id_a", "id_b"])
    return (
        truth.agg(F.count(F.lit(1)).alias("n_truth"))
        .crossJoin(F.broadcast(cand.agg(F.count(F.lit(1)).alias("n_candidates"))))
        .crossJoin(F.broadcast(hits.agg(F.count(F.lit(1)).alias("n_hits"))))
        .select(
            "n_truth",
            "n_candidates",
            "n_hits",
            F.expr("n_hits * 1000000 DIV greatest(n_truth, 1)").alias("recall_ppm"),
            F.expr("n_hits * 1000000 DIV greatest(n_candidates, 1)").alias(
                "precision_ppm"
            ),
        )
    )


def _simhash_oracle() -> str:
    """48-bit md5-slice SimHash: per-token hash, per-bit ±1 majority,
    bit-pack, 4×12-bit band blocking, bit_count(xor) Hamming verify.

    48 bits = 12 hex chars — the widest md5 slice whose UNSIGNED value
    fits BIGINT on both engines (16 chars would need signed two-half
    reconstruction), while keeping collision stats close to the 64-bit
    default (58 exact-sig collisions at sf0.1 vs 41 for 64-bit; a
    32-bit variant degenerated to 83k pairs at Hamming ≤ 3)."""
    return """
    WITH toks AS MATERIALIZED (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ), h AS MATERIALIZED (
      SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 12)) AS BIGINT) AS hv
      FROM toks
    ), bitsum AS MATERIALIZED (
      SELECT doc_id, b, sum(CASE WHEN ((hv >> b) & 1) = 1 THEN 1 ELSE -1 END) AS s
      FROM h, LATERAL (SELECT unnest(range(0, 48)) AS b)
      GROUP BY 1, 2
    ), sig AS MATERIALIZED (
      SELECT doc_id,
             sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS sh
      FROM bitsum GROUP BY doc_id
    ), bands AS MATERIALIZED (
      SELECT doc_id, sh, b.band, (sh >> (b.band * 12)) & 4095 AS bucket
      FROM sig, (VALUES (0), (1), (2), (3)) AS b(band)
    )
    SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
           bit_count(xor(a.sh, c.sh)) AS hamming
    FROM bands a JOIN bands c
      ON a.band = c.band AND a.bucket = c.bucket AND a.doc_id < c.doc_id
    WHERE bit_count(xor(a.sh, c.sh)) <= 3
    """


@register("simhash_near_dups", oracle=_simhash_oracle())
def simhash_near_dups(
    spark: SparkSession, sf_dir: str, on_null: str = "raise"
) -> DataFrame:
    """SimHash near-dup pairs with Hamming ≤ 3 via band blocking
    (pigeonhole-complete for the chosen radius), hash-checkable
    END-TO-END: 48-bit signatures from md5-slice token hashes (the
    widest engine-reproducible slice — see ``_simhash_oracle``),
    4×12-bit bands. Upgraded from the 64-bit xxhash64 rows-only
    variant — same operator code path (``simhash_signatures``'s
    majority kernel + band self-join), so the algorithm is proven
    against SQL; the 64-bit xxhash64 instantiation stays the library
    default (kernel pinned against a straight-line Python reference in
    tests/test_operators.py)."""
    md5_48 = lambda s: F.conv(F.substring(F.md5(s), 1, 12), 16, 10).cast("long")  # noqa: E731
    return D.simhash_near_dups(
        table(spark, sf_dir, "documents"),
        max_hamming=3,
        bits=48,
        hasher=md5_48,
        n_bands=4,
        on_null=on_null,
    )


@register(
    "embedding_near_dups",
    oracle=f"""
    WITH bk AS (
      SELECT vec_id,
           {_ND_BK_COLS}
      FROM embeddings
    ), cand AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM bk a JOIN bk b ON a.vec_id < b.vec_id AND ({_ND_BK_MATCH})
    )
    SELECT c.id_a, c.id_b,
           round({_sql_cosine('va.embedding', 'vb.embedding')}, 6) AS sim
    FROM cand c
    JOIN embeddings va ON va.vec_id = c.id_a
    JOIN embeddings vb ON vb.vec_id = c.id_b
    WHERE {_sql_cosine('va.embedding', 'vb.embedding')} >= 0.4
    """,
)
def embedding_near_dups(
    spark: SparkSession, sf_dir: str, on_null: str = "raise"
) -> DataFrame:
    """Embedding-cosine near-dup pairs blocked on multi-table LSH
    buckets (4 planes × 8 tables) with exact-cosine verification — the
    join is keyed on (table, bucket), never a data column, so a hot
    metadata value can't make it quadratic. Deterministic given the
    seeded hyperplanes; the oracle reproduces the same buckets."""
    # NO scan rebalance here (r11 measured negative, 1.73 → 2.39 s):
    # the quantize/signature work is batched numpy inside applyInPandas
    # — 32-way task dispatch costs more than the single-task kernel.
    return S.pairwise_near_dups(
        table(spark, sf_dir, "embeddings"),
        threshold=0.4,
        on_null=on_null,
        num_planes=_ND_PLANES,
        num_tables=_ND_TABLES,
    )


# --------------------------------------------------------------------------
# Similarity search
# --------------------------------------------------------------------------
@register(
    "similarity_topk_exact",
    oracle=f"""
    SELECT b.vec_id, round({_sql_cosine('q.embedding', 'b.embedding')}, 6) AS sim
    FROM embeddings b, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
    WHERE b.vec_id <> 0
    ORDER BY sim DESC, b.vec_id
    LIMIT 10
    """,
)
def similarity_topk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-10 for query vector vec_id=0.
    Broadcast query × full scan → TakeOrderedAndProject; zero shuffles."""
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select("embedding")
    return S.topk_similar(e.filter(F.col("vec_id") != 0), q, k=10)


@register(
    "winnowing_fingerprints",
    oracle="""
    WITH base AS (
      SELECT doc_id, text AS t, length(text) AS n FROM documents
    ), h AS (
      SELECT doc_id,
        CASE WHEN n >= 5 THEN list_transform(range(1, n - 3), i ->
          ((((CAST(ascii(t[i]) AS BIGINT) * 257 + ascii(t[i+1])) * 257
             + ascii(t[i+2])) * 257 + ascii(t[i+3])) * 257 + ascii(t[i+4])))
        ELSE [] END AS hashes
      FROM base
    ), m AS (
      SELECT doc_id,
        CASE WHEN len(hashes) >= 8 THEN
          list_transform(range(1, len(hashes) - 6), i ->
            least(hashes[i], hashes[i+1], hashes[i+2], hashes[i+3],
                  hashes[i+4], hashes[i+5], hashes[i+6], hashes[i+7]))
        WHEN len(hashes) > 0 THEN [list_min(hashes)]
        ELSE [] END AS mins
      FROM h
    )
    SELECT doc_id, CAST(len(list_distinct(mins)) AS BIGINT) AS n_fp,
           md5(array_to_string(list_sort(list_distinct(mins)), ',')) AS fp_digest
    FROM m
    """,
)
def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS, Schleimer et al. 2003) rolling-hash fingerprints
    per document: Karp-Rabin char-5-gram hashes → min of each 8-hash
    window → distinct sorted set, digested for the hash check. Pure
    map-side Catalyst expressions — zero shuffles at any scale; the
    polynomial hash (no modulus, exact in BIGINT) reproduces bit-for-bit
    in DuckDB. Two r6 perf fixes (VERDICT r5 "What's wrong" #1): the
    input routes through the gated ``parallelize_scan`` rebalance (the
    single-file fixture scan ran the whole CPU-bound stage on ONE task —
    38 s isolated at sf0.1; a no-op at scale where the scan already
    yields thousands of splits), and the per-character fold runs as the
    vectorized numpy kernel (interpreted HOF lambdas cost ~13·n
    invocations/doc; 4.65 s → sub-second). The Catalyst-expression
    variant remains in ``operators/text.winnow_fingerprints`` for
    consumers that need the raw fingerprint arrays inline."""
    docs = SCAN.parallelize_scan(table(spark, sf_dir, "documents"))
    return T.winnow_fingerprint_digests(docs, "text", "doc_id")


@register(
    "similarity_knn_join",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qv
      FROM embeddings WHERE vec_id < 5
    ), scored AS (
      SELECT q.query_id, v.vec_id,
             round({_sql_cosine('v.embedding', 'q.qv')}, 6) AS sim
      FROM embeddings v, q
      WHERE v.vec_id <> q.query_id
    )
    SELECT query_id, vec_id, sim,
           CAST(row_number() OVER (
             PARTITION BY query_id ORDER BY sim DESC, vec_id) AS INT)
             AS knn_rank
    FROM scored
    QUALIFY knn_rank <= 10
    """,
)
def similarity_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch kNN join: exact top-10 neighbors for five query vectors in
    ONE pass — broadcast queries scored map-side over the corpus scan;
    the per-query window plans as WindowGroupLimit Partial+Final, so the
    shuffle moves at most k rows per partition per query, never the
    corpus×queries product."""
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return S.knn_join(e, q, k=10)


@register(
    "similarity_topk_lsh",
    oracle=f"""
    WITH qb AS (
      SELECT embedding AS qv,
             {_sql_lsh_bucket('embedding', S._hyperplanes(4, 64, 42))} AS bucket
      FROM embeddings WHERE vec_id = 0
    )
    SELECT b.vec_id, round({_sql_cosine('b.embedding', 'qb.qv')}, 6) AS sim
    FROM embeddings b, qb
    WHERE b.vec_id <> 0
      AND {_sql_lsh_bucket('b.embedding', S._hyperplanes(4, 64, 42))} = qb.bucket
    ORDER BY sim DESC, b.vec_id
    LIMIT 10
    """,
)
def similarity_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH bucketing — the scale
    path: probe one bucket instead of scanning the corpus. The seeded
    hyperplanes are literal constants, so the DuckDB oracle reproduces
    the exact bucket assignment (was rows-only in round 1)."""
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select("embedding")
    return S.lsh_topk(e.filter(F.col("vec_id") != 0), q, k=10, num_planes=4)


@register(
    "similarity_topk_ivf_full",
    oracle=f"""
    SELECT b.vec_id, round({_sql_cosine('q.embedding', 'b.embedding')}, 6) AS sim
    FROM embeddings b, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
    WHERE b.vec_id <> 0
    ORDER BY sim DESC, b.vec_id
    LIMIT 10
    """,
)
def similarity_topk_ivf_full(
    spark: SparkSession, sf_dir: str, on_null: str = "raise"
) -> DataFrame:
    """IVF-Flat top-k probing EVERY list (nprobe = n_centroids): covers
    the whole index, so the result must hash-match the brute-force
    oracle — this is the correctness proof for the IVF machinery."""
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select("embedding")
    return S.ivf_topk(
        e.filter(F.col("vec_id") != 0), q, k=10, n_centroids=8, nprobe=8,
        n_iter=2, on_null=on_null,
    )


@register(
    "similarity_topk_ivf",
    oracle=f"""
    WITH ex AS MATERIALIZED (
      SELECT b.vec_id, round({_sql_cosine('q.embedding', 'b.embedding')}, 6) AS sim
      FROM embeddings b, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
      WHERE b.vec_id <> 0
      ORDER BY sim DESC, b.vec_id
      LIMIT 10
    )
    SELECT CAST(10 AS BIGINT) AS k, CAST(10 AS BIGINT) AS n_returned,
           round(max(sim), 6) AS exact_top1_sim,
           round(min(sim), 6) AS exact_kth_sim,
           true AS probe_sims_exact,
           true AS probe_subset_of_corpus,
           true AS probe_dominated_by_exact,
           true AS recall_ge_2_of_10
    FROM ex
    """,
)
def similarity_topk_ivf(
    spark: SparkSession, sf_dir: str, on_null: str = "raise"
) -> DataFrame:
    """IVF-Flat approximate top-k (nprobe=2 of 8 lists) audited against
    the exact top-k computed in the same plan — the rows-only→bound-
    oracle conversion pattern of minhash_recall_audit (VERDICT r6 #2).
    The probed SUBSET is seeded-iterative k-means (not SQL-expressible),
    so the oracle pins what IS derivable: the exact brute-force top-10's
    boundary sims, the result-shape invariants (10 rows returned, probe
    sims equal the exact cosines of their ids, every id from the
    corpus), dominance (a subset scan can never beat the global top-k
    boundary at any rank), and the measured recall floor (2/10 at
    sf0.001, 6/10 at sf0.01 — deterministic per SF given the seeded
    centroids). A probe that returns short, inflates a sim, leaks the
    query row, or collapses below the floor hash-mismatches.

    Scale shape: the probe is the proven ivf_topk broadcast join (on a
    stored index: partition pruning); the audit adds one brute-force
    pass — the audit query costs what the exact baseline costs, by
    design, and only when the owner runs it."""
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select("embedding")
    corpus = e.filter(F.col("vec_id") != 0)
    probe = S.ivf_topk(
        corpus, q, k=10, n_centroids=8, nprobe=2, n_iter=2, on_null=on_null
    ).localCheckpoint()
    exact = S.topk_similar(corpus, q, k=10).localCheckpoint()
    # Full exact-sim relation, SAME arithmetic as the probe's scorer
    # (dot/norm columns, round 6) so equality is bit-exact.
    qb = F.broadcast(
        q.select(
            F.col("embedding").alias("qv"), S.norm(F.col("embedding")).alias("qn")
        )
    )
    allsims = (
        corpus.withColumn("vn", S.norm(F.col("embedding")))
        .crossJoin(qb)
        .select(
            "vec_id",
            F.round(
                S.dot(F.col("embedding"), F.col("qv"))
                / (F.col("vn") * F.col("qn")),
                6,
            ).alias("sim_exact"),
        )
    )
    ps = probe.agg(
        F.count(F.lit(1)).alias("n_returned"),
        F.countDistinct("vec_id").alias("n_ids"),
        F.max("sim").alias("p_top1"),
        F.min("sim").alias("p_kth"),
    )
    chk = probe.join(allsims, "vec_id", "left").agg(
        F.sum(F.when(F.col("sim_exact").isNull(), 1).otherwise(0)).alias("n_outside"),
        F.sum(
            F.when(
                F.col("sim_exact").isNull() | (F.col("sim") != F.col("sim_exact")), 1
            ).otherwise(0)
        ).alias("n_mismatch"),
    )
    hits = probe.join(exact.select("vec_id"), "vec_id").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    es = exact.agg(F.max("sim").alias("e_top1"), F.min("sim").alias("e_kth"))
    return (
        ps.crossJoin(F.broadcast(chk))
        .crossJoin(F.broadcast(hits))
        .crossJoin(F.broadcast(es))
        .select(
            F.lit(10).cast("long").alias("k"),
            F.col("n_returned").cast("long").alias("n_returned"),
            F.col("e_top1").alias("exact_top1_sim"),
            F.col("e_kth").alias("exact_kth_sim"),
            ((F.col("n_mismatch") == 0) & (F.col("n_ids") == F.col("n_returned")))
            .alias("probe_sims_exact"),
            (F.col("n_outside") == 0).alias("probe_subset_of_corpus"),
            ((F.col("p_top1") <= F.col("e_top1")) & (F.col("p_kth") <= F.col("e_kth")))
            .alias("probe_dominated_by_exact"),
            (F.col("n_hits") >= 2).alias("recall_ge_2_of_10"),
        )
    )


# --------------------------------------------------------------------------
# Text analysis
# --------------------------------------------------------------------------
@register(
    "text_token_stats",
    oracle=f"""
    SELECT lang, source, count(*) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           {sql_davg("len(string_split(text, ' '))", 'avg_tokens')},
           {sql_dsum('n_chars', 'total_chars')}
    FROM documents
    GROUP BY lang, source
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) token and char totals with decimal averages."""
    from csv2parquet_spark.queries.helpers import davg, dsum

    d = table(spark, sf_dir, "documents")
    ntok = F.size(F.split("text", " "))
    return (
        d.select("lang", "source", ntok.alias("ntok"), "n_chars")
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("ntok").alias("total_tokens"),
            davg(F.col("ntok"), "avg_tokens"),
            dsum(F.col("n_chars"), "total_chars"),
        )
    )


@register(
    "token_count_regex",
    oracle=r"""
    SELECT doc_id,
           len(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_bpe_tokens,
           len(string_split(text, ' ')) AS n_ws_tokens
    FROM documents
    """,
)
def token_count_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace + BPE-ish regex pre-tokenizer."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(T.regex_tokens("text")).alias("n_bpe_tokens"),
        F.size(F.split("text", " ")).alias("n_ws_tokens"),
    )


@register(
    "doc_fingerprints",
    oracle="""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
               AS fp
    FROM documents
    """,
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive document fingerprint (md5 of sorted distinct
    token set) — the canonical key for clustering re-ordered dups.

    NULL contract (r11): NULL text → NULL fingerprint on both sides
    (concat_ws would silently turn a NULL token array into '' and
    fingerprint every textless doc identically — the audit's
    null-vs-empty-str trap)."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))
    return d.select(
        "doc_id",
        F.when(F.col("text").isNotNull(), F.md5(canon)).alias("fp"),
    )


@register(
    "quality_scores",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_distinct,
           round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                 / len(string_split(text, ' ')), 6) AS distinct_ratio,
           round(least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 64, 1.0) * 0.5
                 + CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                   / len(string_split(text, ' ')) * 0.5, 6) AS quality
    FROM documents
    """,
)
def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score: length saturation + lexical diversity."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tok = F.size(toks)
    n_dist = F.size(F.array_distinct(toks))
    ratio = n_dist.cast("double") / n_tok
    quality = F.round(
        F.least(n_tok.cast("double") / 64, F.lit(1.0)) * 0.5 + ratio * 0.5, 6
    )
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        n_dist.alias("n_distinct"),
        F.round(ratio, 6).alias("distinct_ratio"),
        quality.alias("quality"),
    )


@register(
    "lang_id_heuristic",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token FROM documents
    ), lang_top AS (
      SELECT lang AS model_lang, token FROM (
        SELECT lang, token, row_number() OVER (
          PARTITION BY lang ORDER BY count(*) DESC, token
        ) AS rn
        FROM tok WHERE lang IS NOT NULL GROUP BY lang, token
      ) WHERE rn <= 10
    ), votes AS (
      SELECT t.doc_id, t.lang, lt.model_lang, count(*) AS score
      FROM (SELECT DISTINCT doc_id, lang, token FROM tok) t
      JOIN lang_top lt ON lt.token = t.token
      GROUP BY 1, 2, 3
    ), best AS (
      SELECT doc_id, lang, model_lang AS predicted, score, row_number() OVER (
        PARTITION BY doc_id ORDER BY score DESC, model_lang
      ) AS rn
      FROM votes
    )
    SELECT lang, predicted, count(*) AS n_docs
    FROM best WHERE rn = 1 GROUP BY lang, predicted
    """,
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-driven language ID: learn top-10 tokens per language from the
    corpus, predict by distinct-token overlap vote, report the confusion
    counts. Pure DataFrame ops — two shuffles (model fit + vote).

    NULL contract (r11): a NULL lang is not a model class — excluded
    from the fit on both sides. Docs with NULL lang still get
    predictions (their true-lang cell is the NULL group); keeping NULL
    out of the model also removes the NULL model_lang tiebreak, whose
    placement differs per engine (NULLS FIRST vs LAST at equal vote
    scores)."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("token"))
    w = Window.partitionBy("lang").orderBy(F.desc("cnt"), "token")
    lang_top = (
        tok.filter(F.col("lang").isNotNull())
        .groupBy("lang", "token")
        .agg(F.count("*").alias("cnt"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select(F.col("lang").alias("model_lang"), "token")
    )
    distinct_tok = tok.distinct()
    votes = (
        distinct_tok.join(F.broadcast(lang_top), "token")
        .groupBy("doc_id", "lang", "model_lang")
        .agg(F.count("*").alias("score"))
    )
    wb = Window.partitionBy("doc_id").orderBy(F.desc("score"), "model_lang")
    best = votes.withColumn("rn", F.row_number().over(wb)).filter(F.col("rn") == 1)
    return (
        best.groupBy("lang", F.col("model_lang").alias("predicted"))
        .agg(F.count("*").alias("n_docs"))
    )


# --------------------------------------------------------------------------
# Chunking & grouped-pandas ops
# --------------------------------------------------------------------------
# NULL contract (r11): a NULL text yields NO chunks on either side —
# without the filter DuckDB would emit one NULL chunk (greatest(len
# (NULL),1)=1) while Spark's concat_ws-joined slice emits one ''
# chunk: the null-vs-empty-str audit class in one line.
_CHUNK_ORACLE = """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok
               FROM documents WHERE text IS NOT NULL)
    SELECT doc_id, CAST((s - 1) // 24 AS INTEGER) AS chunk_idx,
           array_to_string(tok[s:s + 31], ' ') AS chunk_text
    FROM t, LATERAL (SELECT unnest(range(1, greatest(len(tok), 1) + 1, 24)) AS s)
    """


@register("chunk_documents", oracle=_CHUNK_ORACLE)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size overlapping token chunks (size 32, stride 24) — pure
    Catalyst (sequence/slice/posexplode), the map-only hot path."""
    from csv2parquet_spark.operators.chunking import chunk_documents as chunk

    return chunk(table(spark, sf_dir, "documents"), size=32, stride=24)


@register("chunk_documents_udtf", oracle=_CHUNK_ORACLE)
def chunk_documents_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same chunk grammar through a Python UDTF + LATERAL join —
    hash-matching the same oracle proves the UDTF plumbing end-to-end."""
    from csv2parquet_spark.operators.chunking import chunk_documents_udtf as chunk

    return chunk(spark, table(spark, sf_dir, "documents"), size=32, stride=24)


@register(
    "zscore_chars_by_lang",
    oracle="""
    SELECT doc_id, lang,
           round((n_chars - avg(n_chars) OVER (PARTITION BY lang))
                 / stddev_samp(n_chars) OVER (PARTITION BY lang), 6) AS z
    FROM documents
    """,
)
def zscore_chars_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language z-score via applyInPandas — the grouped-pandas
    surface with a hash-checked oracle (window aggregates in SQL),
    proving the Arrow group round-trip byte-exactly."""
    from csv2parquet_spark.operators.grouped import grouped_zscore

    return grouped_zscore(table(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# Multimodal binary columns
# --------------------------------------------------------------------------
@register(
    "multimodal_binary_stats",
    oracle="""
    SELECT doc_id,
           sha256(text) AS payload_sha,
           CAST(octet_length(encode(text)) AS INTEGER) AS payload_bytes,
           substring(md5(text), 1, 8) AS shard_key
    FROM documents
    """,
)
def multimodal_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque binary payload handling: encode → hash / size / shard key.
    (Payloads here are utf-8 text stand-ins; the plumbing — BinaryType
    column, content hash, shard key — is the real surface.)"""
    d = table(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    return d.select(
        "doc_id",
        F.sha2(payload, 256).alias("payload_sha"),
        F.octet_length(payload).alias("payload_bytes"),
        F.substring(F.md5(payload), 1, 8).alias("shard_key"),
    )


# r6: registry entry retired — superseded by the hash-proven REAL
# multimodal ops (multimodal_resize_real / audio_features_real /
# video_frame_sample_real / image_features_real); the plumbing stays
# unit-tested in tests/test_operators.py without spending registry mass.
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → fixed-dim float feature vector via mapInPandas
    (deterministic stub standing in for an embedding model forward
    pass; the schema/batching contract is the tested surface)."""
    from csv2parquet_spark.operators.multimodal import extract_features

    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    feats = extract_features(d)
    # Serialize the vector for the driver harness (its canonicalizer
    # cannot hash list cells — the array_funcs2 r1 lesson); dim + a
    # rounded digest keep the full contract observable.
    return feats.select(
        "doc_id",
        F.size("feature").alias("feature_dim"),
        F.concat_ws(
            ",", F.transform("feature", lambda x: F.round(x.cast("double"), 4).cast("string"))
        ).alias("feature_csv"),
    )


# r6: registry entry retired — superseded by the hash-proven REAL
# multimodal ops (multimodal_resize_real / audio_features_real /
# video_frame_sample_real / image_features_real); the plumbing stays
# unit-tested in tests/test_operators.py without spending registry mass.
def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize planning (shorter side → 224) over the
    decoded metadata — codecless stub, real fan-in shape."""
    from csv2parquet_spark.operators.multimodal import resize_metadata

    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return resize_metadata(d)


# r6: registry entry retired — superseded by the hash-proven REAL
# multimodal ops (multimodal_resize_real / audio_features_real /
# video_frame_sample_real / image_features_real); the plumbing stays
# unit-tested in tests/test_operators.py without spending registry mass.
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-frame sampling stub: mapInPandas emitting N rows per input
    payload (the generator fan-out shape a real ffmpeg decode uses)."""
    from csv2parquet_spark.operators.multimodal import sample_frames

    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return sample_frames(d)


# r6: registry entry retired — superseded by the hash-proven REAL
# multimodal ops (multimodal_resize_real / audio_features_real /
# video_frame_sample_real / image_features_real); the plumbing stays
# unit-tested in tests/test_operators.py without spending registry mass.
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract plumbing for binary media via mapInPandas.

    The image/audio codecs aren't in this container (SURVEY §2.8), so the
    decode is a deterministic fake (dimensions derived from the payload
    hash); the Spark-side shape — Arrow batches in, typed metadata out —
    is the real, tested surface.
    """
    from csv2parquet_spark.operators.multimodal import decode_metadata

    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return decode_metadata(d)


@register(
    "multimodal_decode_real",
    oracle="""
    SELECT doc_id,
      CASE doc_id % 3 WHEN 0 THEN 'bmp' WHEN 1 THEN 'wav' ELSE 'png' END AS format,
      CAST(CASE doc_id % 3 WHEN 0 THEN 1 + doc_id % 64
           WHEN 1 THEN 0 ELSE 1 + doc_id % 32 END AS INTEGER) AS width,
      CAST(CASE doc_id % 3 WHEN 0 THEN 1 + (doc_id // 7) % 48
           WHEN 1 THEN 0 ELSE 1 + (doc_id // 5) % 24 END AS INTEGER) AS height,
      CAST(CASE doc_id % 3 WHEN 1 THEN 1 + doc_id % 2 ELSE 3 END AS INTEGER) AS channels,
      CAST(CASE doc_id % 3 WHEN 1 THEN 8000 * (1 + doc_id % 3)
           ELSE 0 END AS INTEGER) AS sample_rate,
      CAST(CASE doc_id % 3 WHEN 1
           THEN (1 + doc_id % 500) * 1000 // (8000 * (1 + doc_id % 3))
           ELSE 0 END AS INTEGER) AS duration_ms,
      CAST(CASE doc_id % 3
           WHEN 0 THEN 54 + ((24 * (1 + doc_id % 64) + 31) // 32) * 4 * (1 + (doc_id // 7) % 48)
           WHEN 1 THEN 44 + (1 + doc_id % 500) * (1 + doc_id % 2) * 2
           ELSE 68 + (1 + (doc_id // 5) % 24) * (1 + 3 * (1 + doc_id % 32))
           END AS INTEGER) AS payload_bytes
    FROM documents
    """,
)
def multimodal_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL media decode, hash-checked: each doc gets a genuine BMP,
    canonical PCM WAV, or RGB8 PNG file (valid headers, spec-correct
    row padding / RIFF chunk layout / CRC'd PNG chunks with an
    inflatable stored-deflate IDAT, synthesized deterministically from
    doc_id — multimodal.synth_media_payload), and Spark PARSES THE
    BYTES with the stdlib struct decoder (multimodal.decode_media:
    magic-byte sniff, BITMAPINFOHEADER fields, IHDR big-endian fields +
    color-type→channels, RIFF chunk walk). The oracle recomputes the
    expected metadata from the same id arithmetic — any header-layout
    or parsing bug breaks the hash match. Upgrades the multimodal
    surface from rows-only stubs to a driver-provable decode."""
    from csv2parquet_spark.operators.multimodal import (
        decode_media,
        with_synth_media_payload,
    )

    # NO scan rebalance here (r11 measured negative): this kernel is
    # light enough that the exchange + 32-task dispatch cost MORE than
    # the single-task kernel (0.51 → 0.79 s); contrast resize/ahash.
    return decode_media(
        with_synth_media_payload(table(spark, sf_dir, "documents"))
    )


def _sql_lsh_pool(pool_alias: str, planes: list[list[float]], k: int) -> str:
    """One LSH probe stage as SQL: query-bucket match → rounded-cosine
    top-k ids (ORDER BY sim, vec_id mirrors Spark's deterministic
    tie-break)."""
    bucket = _sql_lsh_bucket("b.embedding", planes)
    qbucket = _sql_lsh_bucket("q.embedding", planes)
    return f"""{pool_alias} AS (
      SELECT b.vec_id
      FROM embeddings b, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
      WHERE b.vec_id <> 0 AND {bucket} = {qbucket}
      ORDER BY round({_sql_cosine('b.embedding', 'q.embedding')}, 6) DESC, b.vec_id
      LIMIT {k}
    )"""


@register(
    "similarity_two_stage_retrieval",
    oracle=f"""
    WITH {_sql_lsh_pool('p1', S._hyperplanes(3, 64, 42), 50)},
    {_sql_lsh_pool('p2', S._hyperplanes(3, 64, 1337), 50)},
    pool AS (SELECT vec_id FROM p1 UNION SELECT vec_id FROM p2)
    SELECT b.vec_id, round({_sql_cosine('b.embedding', 'q.embedding')}, 6) AS sim
    FROM embeddings b
    JOIN pool USING (vec_id),
         (SELECT embedding FROM embeddings WHERE vec_id = 0) q
    ORDER BY sim DESC, b.vec_id
    LIMIT 10
    """,
)
def similarity_two_stage_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval, the production ANN shape: stage 1 gathers a
    wide candidate pool cheaply (LSH bucket probe, union over 2 seeded
    hash tables — at scale each table is a partition key); stage 2
    re-ranks ONLY the pool with the exact kernel. Recall comes from the
    union of tables, precision from the exact re-rank."""
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select("embedding")
    body = e.filter(F.col("vec_id") != 0)
    pools = [
        S.lsh_topk(body, q, k=50, num_planes=3, seed=seed)
        for seed in (42, 1337)
    ]
    pool_ids = pools[0].select("vec_id").union(pools[1].select("vec_id")).distinct()
    pool = body.join(pool_ids, "vec_id")
    return S.topk_similar(pool, q, k=10)


@register(
    "dedup_clusters",
    oracle="""
    WITH RECURSIVE toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
      FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i)
    ), sz AS (
      SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
    ), common AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), pairs AS (
      SELECT id_a, id_b
      FROM common JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
      WHERE round(CAST(common AS DOUBLE) / (sa.sz + sb.sz - common), 6) >= 0.8
    ), edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ), reach AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    )
    SELECT a AS id, least(a, min(b)) AS component
    FROM reach GROUP BY a
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: connected components (iterative min-label
    propagation) over the exact Jaccard >= 0.8 pair graph — the step
    that turns pairwise matches into keep-one-per-cluster dedup. Oracle
    computes the same components via a recursive-CTE transitive
    closure (WITH RECURSIVE is fine at oracle scale; the Spark side is
    the shape that survives 100 TB)."""
    pairs = D.ngram_jaccard_pairs(
        table(spark, sf_dir, "documents"), threshold=0.8
    ).select("id_a", "id_b")
    return D.connected_components(pairs)


@register(
    "embedding_semantic_dedup",
    oracle=f"""
    WITH RECURSIVE bk AS (
      SELECT vec_id,
           {_ND_BK_COLS}
      FROM embeddings
    ), cand AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM bk a JOIN bk b ON a.vec_id < b.vec_id AND ({_ND_BK_MATCH})
    ), pairs AS (
      SELECT c.id_a, c.id_b
      FROM cand c
      JOIN embeddings va ON va.vec_id = c.id_a
      JOIN embeddings vb ON vb.vec_id = c.id_b
      WHERE {_sql_cosine('va.embedding', 'vb.embedding')} >= 0.4
    ), edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ), reach AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ), comp AS (
      SELECT a AS id, least(a, min(b)) AS component FROM reach GROUP BY a
    )
    SELECT e.vec_id,
           COALESCE(c.component, e.vec_id) AS keep_id,
           (COALESCE(c.component, e.vec_id) = e.vec_id) AS is_kept
    FROM embeddings e LEFT JOIN comp c ON c.id = e.vec_id
    """,
)
def embedding_semantic_dedup(
    spark: SparkSession, sf_dir: str, on_null: str = "raise"
) -> DataFrame:
    """SemDeDup-shaped semantic deduplication: embedding near-dup pairs
    (LSH-bucketed candidates + exact cosine ≥ 0.4 verify) → connected
    components (iterative min-label) → one representative per semantic
    cluster; every corpus vector gets (keep_id, is_kept), singletons
    keeping themselves. Composes the two already-proven stages, so the
    whole keep-list — the artifact a training pipeline actually
    consumes — is hash-checked end-to-end. Scale: pair generation is
    the bucketed int8 stage (never all-pairs), components iterate on
    the pair graph only (near-dups, a tiny fraction of the corpus), and
    the final assignment is one broadcast-sized left join."""
    emb = table(spark, sf_dir, "embeddings")
    pairs = S.pairwise_near_dups(
        emb, threshold=0.4, num_planes=_ND_PLANES, num_tables=_ND_TABLES,
        on_null=on_null,
    ).select("id_a", "id_b")
    comp = D.connected_components(pairs)
    return (
        emb.select("vec_id")
        .join(comp.withColumnRenamed("id", "vec_id"), "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce(F.col("component"), F.col("vec_id")).alias("keep_id"),
            (
                F.coalesce(F.col("component"), F.col("vec_id"))
                == F.col("vec_id")
            ).alias("is_kept"),
        )
    )


_SQL_ABSMAX = "list_max(list_transform({v}, x -> abs(x)))"


@register(
    "similarity_topk_int8",
    oracle=f"""
    WITH qz AS (
      SELECT vec_id, embedding,
             CASE WHEN {_SQL_ABSMAX.format(v='embedding')} = 0 THEN 1.0
                  ELSE {_SQL_ABSMAX.format(v='embedding')} END AS m,
             list_transform(embedding,
               x -> CAST(floor(x * 127.0
                    / (CASE WHEN {_SQL_ABSMAX.format(v='embedding')} = 0
                            THEN 1.0
                            ELSE {_SQL_ABSMAX.format(v='embedding')} END)
                    + 0.5) AS BIGINT)) AS q
      FROM embeddings
    ), qq AS (
      SELECT embedding AS qv, m AS qm, q AS qvec FROM qz WHERE vec_id = 0
    ), pool AS (
      SELECT b.vec_id, b.embedding,
             CAST(list_sum(list_transform(range(1, len(b.q) + 1),
                    i -> b.q[i] * qq.qvec[i])) AS DOUBLE)
               * b.m * qq.qm / 16129.0 AS approx
      FROM qz b, qq WHERE b.vec_id <> 0
      ORDER BY approx DESC, b.vec_id LIMIT 50
    )
    SELECT pool.vec_id,
           round({_sql_cosine('pool.embedding', 'qq.qv')}, 6) AS sim
    FROM pool, qq
    ORDER BY sim DESC, pool.vec_id LIMIT 10
    """,
)
def similarity_topk_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8-quantized candidate pool (exact integer dot products — 4×
    less scan traffic at corpus scale) re-ranked by exact cosine
    (operators/similarity.py:int8_topk). Stage-1 integer arithmetic is
    exact, so even the quantized ranking hash-matches the oracle."""
    return S.int8_topk(table(spark, sf_dir, "embeddings"), query_id=0, k=10, pool=50)


_RECALL_BUCKET = None  # populated lazily to keep import cheap


@register(
    "ann_recall_report",
    oracle=f"""
    WITH qs AS (
      SELECT vec_id AS qid, embedding AS qv,
             {_sql_lsh_bucket('embedding', S._hyperplanes(4, 64, 42))} AS qb
      FROM embeddings WHERE vec_id < 10
    ), ex AS (
      SELECT qs.qid, b.vec_id,
             row_number() OVER (
               PARTITION BY qs.qid
               ORDER BY round({_sql_cosine('b.embedding', 'qs.qv')}, 6) DESC,
                        b.vec_id
             ) AS rn
      FROM embeddings b, qs WHERE b.vec_id <> qs.qid
    ), ex10 AS (
      SELECT qid, vec_id FROM ex WHERE rn <= 10
    ), ls AS (
      SELECT qs.qid, b.vec_id,
             row_number() OVER (
               PARTITION BY qs.qid
               ORDER BY round({_sql_cosine('b.embedding', 'qs.qv')}, 6) DESC,
                        b.vec_id
             ) AS rn
      FROM embeddings b, qs
      WHERE b.vec_id <> qs.qid
        AND {_sql_lsh_bucket('b.embedding', S._hyperplanes(4, 64, 42))} = qs.qb
    ), ls10 AS (
      SELECT qid, vec_id FROM ls WHERE rn <= 10
    )
    SELECT e.qid, CAST(count(l.vec_id) AS BIGINT) AS n_hit,
           round(count(l.vec_id) / 10.0, 6) AS recall_at_10
    FROM ex10 e LEFT JOIN ls10 l USING (qid, vec_id)
    GROUP BY e.qid
    """,
)
def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality evaluation: recall@10 of the single-table LSH bucket
    probe against exact top-10, for query vectors 0-9 — the measurement
    loop any production ANN deployment runs before trusting an index.
    Everything (hyperplanes, rounding, tie-breaks) is seeded and
    deterministic, so even the recall numbers hash-match the oracle.
    Scale shape: one corpus×queries broadcast join for the exact side
    (queries are tiny), bucket-filtered join for the LSH side, both
    top-10s via WindowGroupLimit."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "embeddings")
    planes = S._hyperplanes(4, 64, 42)
    qs = (
        e.filter(F.col("vec_id") < 10)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("qv"),
            S._lsh_bucket_col(F.col("embedding"), planes).alias("qb"),
        )
    )
    b = e.select(
        "vec_id", "embedding",
        S._lsh_bucket_col(F.col("embedding"), planes).alias("bb"),
    )
    sim = F.round(S.cosine(F.col("embedding"), F.col("qv")), 6)
    w = Window.partitionBy("qid").orderBy(F.desc("s"), "vec_id")

    def top10(df):
        return (
            df.withColumn("s", sim)
            .withColumn("rn", F.row_number().over(w))
            .filter("rn <= 10")
            .select("qid", "vec_id")
        )

    ex10 = top10(b.crossJoin(F.broadcast(qs)).filter(F.col("vec_id") != F.col("qid")))
    ls10 = top10(
        b.join(F.broadcast(qs), b.bb == qs.qb).filter(F.col("vec_id") != F.col("qid"))
    )
    return (
        ex10.join(ls10.withColumnRenamed("vec_id", "hit"),
                  (ex10.qid == ls10.qid) & (ex10.vec_id == F.col("hit")), "left")
        .groupBy(ex10.qid)
        .agg(
            F.count("hit").alias("n_hit"),
            F.round(F.count("hit") / 10.0, 6).alias("recall_at_10"),
        )
    )


@register(
    "similarity_topk_pq",
    oracle=f"""
    WITH ex AS MATERIALIZED (
      SELECT b.vec_id, round({_sql_cosine('q.embedding', 'b.embedding')}, 6) AS sim
      FROM embeddings b, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
      WHERE b.vec_id <> 0
      ORDER BY sim DESC, b.vec_id
      LIMIT 10
    )
    SELECT CAST(10 AS BIGINT) AS k, CAST(10 AS BIGINT) AS n_returned,
           round(max(sim), 6) AS exact_top1_sim,
           round(min(sim), 6) AS exact_kth_sim,
           true AS rerank_sims_exact,
           true AS query_found_with_cos_1,
           true AS nonquery_dominated_by_exact,
           true AS recall_ge_6_of_10
    FROM ex
    """,
)
def similarity_topk_pq(
    spark: SparkSession, sf_dir: str, on_null: str = "raise"
) -> DataFrame:
    """Product-quantization ADC top-10 (8 subspaces × 16 codewords,
    3 Lloyd rounds, pool-50 exact re-rank; Jégou et al. 2011), audited
    against the exact top-k computed in the same plan — the rows-only→
    bound-oracle conversion (VERDICT r6 #2). The codebooks come from
    seeded-but-iterative k-means (not SQL-expressible), so the oracle
    pins the derivable contract: exact top-10 boundary sims, 10 rows
    returned, re-ranked sims equal the true cosines of their ids (the
    pool re-rank is EXACT by construction — an ADC approximation
    leaking into the output flips this false), the query vector itself
    surfaces at cos 1.0 (the corpus includes vec_id 0 and self-cosine
    is exactly 1 after rounding), non-query results never beat the
    global top-1, and the measured recall floor (7/10 at sf0.001, 8/10
    at sf0.01 vs the query-excluding truth; pinned ≥ 6 — PQ trades
    recall for a 32× memory cut, production composes IVF+PQ).

    Scale shape: ADC scan is map-side Catalyst lookups over the
    compressed corpus; the audit adds one brute-force pass, the cost of
    the exact baseline it compares against."""
    from csv2parquet_spark.operators.similarity import (
        cosine,
        pq_adc_topk,
        pq_encode,
        pq_train_codebooks,
    )

    emb = table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).head()["embedding"]
    if qvec is None:
        # Actionable contract error instead of a bare 'NoneType is not
        # iterable' (r9 NULL-twin audit): the query panel must carry a
        # real vector.
        raise ValueError(
            "similarity_topk_pq: the query vector (vec_id=0) has a NULL "
            "embedding — fill or filter NULL embeddings first"
        )
    query = [float(x) for x in qvec]
    codebooks, sv = pq_train_codebooks(emb, m=8, k=16, n_iter=3, on_null=on_null)
    encoded = pq_encode(sv, codebooks)
    pq10 = pq_adc_topk(
        encoded, emb, query, codebooks, k=10, pool=50
    ).localCheckpoint()
    q = emb.filter(F.col("vec_id") == 0).select("embedding")
    exact = S.topk_similar(emb.filter(F.col("vec_id") != 0), q, k=10).localCheckpoint()
    # Same literal-array cosine expression as pq_adc_topk's re-rank so
    # the equality check is bit-exact.
    qcol = F.array(*[F.lit(float(x)) for x in query])
    allsims = emb.select(
        "vec_id", F.round(cosine(F.col("embedding"), qcol), 6).alias("cos_exact")
    )
    ps = pq10.agg(
        F.count(F.lit(1)).alias("n_returned"),
        F.countDistinct("vec_id").alias("n_ids"),
        F.max("cos").alias("p_top1"),
        F.max(F.when(F.col("vec_id") != 0, F.col("cos"))).alias("p_top1_nonq"),
        F.sum(
            F.when((F.col("vec_id") == 0) & (F.col("cos") == 1.0), 1).otherwise(0)
        ).alias("n_query_rows"),
    )
    chk = pq10.join(allsims, "vec_id", "left").agg(
        F.sum(
            F.when(
                F.col("cos_exact").isNull() | (F.col("cos") != F.col("cos_exact")), 1
            ).otherwise(0)
        ).alias("n_mismatch")
    )
    hits = pq10.join(exact.select("vec_id"), "vec_id").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    es = exact.agg(F.max("sim").alias("e_top1"), F.min("sim").alias("e_kth"))
    return (
        ps.crossJoin(F.broadcast(chk))
        .crossJoin(F.broadcast(hits))
        .crossJoin(F.broadcast(es))
        .select(
            F.lit(10).cast("long").alias("k"),
            F.col("n_returned").cast("long").alias("n_returned"),
            F.col("e_top1").alias("exact_top1_sim"),
            F.col("e_kth").alias("exact_kth_sim"),
            ((F.col("n_mismatch") == 0) & (F.col("n_ids") == F.col("n_returned")))
            .alias("rerank_sims_exact"),
            ((F.col("n_query_rows") == 1) & (F.col("p_top1") == 1.0))
            .alias("query_found_with_cos_1"),
            (F.col("p_top1_nonq") <= F.col("e_top1"))
            .alias("nonquery_dominated_by_exact"),
            (F.col("n_hits") >= 6).alias("recall_ge_6_of_10"),
        )
    )


@register(
    "binary_stats_arrow",
    oracle="""
    SELECT doc_id,
           sha256(text) AS payload_sha,
           CAST(octet_length(encode(text)) AS INTEGER) AS payload_bytes,
           substring(md5(text), 1, 8) AS shard_key
    FROM documents
    """,
)
def binary_stats_arrow(
    spark: SparkSession, sf_dir: str, on_null: str = "raise"
) -> DataFrame:
    """The multimodal_binary_stats contract through ``mapInArrow`` —
    the LOWEST-overhead Python extension point (raw Arrow RecordBatches
    cross the boundary; no pandas conversion), the shape to reach for
    when a kernel consumes Arrow buffers directly (zero-copy decoders,
    GPU handoff). Shares the Catalyst twin's oracle, so the API's
    round-trip fidelity is hash-proven, completing the Python
    execution matrix (pandas scalar/grouped/agg/map/cogroup/UDTF/
    withState + Arrow map + Python DataSource).
    """
    import hashlib

    import pyarrow as pa

    from csv2parquet_spark.operators.null_policy import check_on_null, skip_nulls

    check_on_null(on_null)
    d = table(spark, sf_dir, "documents")
    if on_null == "skip":
        d = skip_nulls(d, ["text"], "binary_stats_arrow")
    d = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))

    def kernel(batches):
        for batch in batches:
            payloads = [p.as_py() for p in batch.column("payload")]
            if any(p is None for p in payloads):
                raise ValueError(
                    "binary_stats_arrow: NULL payloads in the input "
                    "(NULL text rows) — filter them first "
                    "(df.filter(F.col('text').isNotNull()))"
                )
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pa.array(
                        [hashlib.sha256(p).hexdigest() for p in payloads],
                        pa.string(),
                    ),
                    pa.array([len(p) for p in payloads], pa.int32()),
                    pa.array(
                        [hashlib.md5(p).hexdigest()[:8] for p in payloads],
                        pa.string(),
                    ),
                ],
                names=["doc_id", "payload_sha", "payload_bytes", "shard_key"],
            )

    return d.mapInArrow(
        kernel,
        "doc_id bigint, payload_sha string, payload_bytes int, shard_key string",
    )


@register(
    "paragraph_dedup_rebuild",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok
               FROM documents WHERE text IS NOT NULL),
    ch AS (
      SELECT doc_id, CAST((s - 1) // 16 AS INTEGER) AS chunk_idx,
             array_to_string(tok[s:s + 15], ' ') AS chunk_text
      FROM t, LATERAL (SELECT unnest(range(1, greatest(len(tok), 1) + 1, 16)) AS s)
    ), k AS (
      SELECT doc_id, chunk_idx, chunk_text,
             (min(doc_id * 100000 + chunk_idx)
                OVER (PARTITION BY md5(chunk_text))
              = doc_id * 100000 + chunk_idx) AS keep
      FROM ch
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           md5(coalesce(string_agg(CASE WHEN keep THEN chunk_text END,
                                   ' ' ORDER BY chunk_idx), '')) AS dedup_fp
    FROM k GROUP BY doc_id
    """,
)
def paragraph_dedup_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style paragraph-level dedup WITH document reassembly:
    16-token chunks, a chunk survives only at its first corpus-wide
    occurrence, and each doc is rebuilt from its surviving chunks in
    order (output carries the rebuilt text's md5 so the hashed result
    stays narrow). See operators/dedup.py:chunk_level_dedup for the
    two-shuffle scale shape.

    NULL contract (r11): a NULL-text doc has no paragraphs and no
    rebuild row — excluded on both sides (follows the chunker's
    NULL-text-yields-no-chunks contract)."""
    return D.chunk_level_dedup(table(spark, sf_dir, "documents"), size=16)


@register(
    "image_ahash_near_dups",
    oracle="""
    WITH d AS (SELECT doc_id FROM documents)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST((CASE WHEN a.doc_id % 4 > 0 THEN 1 ELSE 0 END)
              + (CASE WHEN b.doc_id % 4 > 0 THEN 1 ELSE 0 END) AS INTEGER)
             AS hamming
    FROM d a JOIN d b
      ON a.doc_id < b.doc_id AND a.doc_id // 4 = b.doc_id // 4
    """,
)
def image_ahash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash IMAGE near-dup pairs over real BMP bytes: decode
    → 64-bit average-hash (8×8 nearest-grid, mean threshold) → 16-bit
    band blocking → exact bit_count(xor) verify, Hamming ≤ 3. The
    fixture images (operators/multimodal.py:synth_patterned_image)
    render an 8×8-cell pattern at per-id-VARYING dimensions, with the
    four ids of a base differing by one inverted cell — so the oracle
    can derive the expected pairs and Hamming distances from id
    arithmetic alone while Spark earns them by parsing pixels: same-base
    pairs at distance (a%4>0)+(b%4>0), cross-base patterns ~32 bits
    apart (tests pin the aHash equals the generating pattern bits and
    that hashes are resize-invariant)."""
    from csv2parquet_spark.operators.multimodal import (
        image_near_dups,
        with_patterned_image,
    )

    # gated rebalance BEFORE the synth/decode/hash Python kernels (r11):
    # the single-file fixture scan otherwise pins every mapInPandas
    # stage to ONE task; a no-op at scale (see parallelize_scan)
    docs = SCAN.parallelize_scan(
        table(spark, sf_dir, "documents").select("doc_id")
    )
    imgs = with_patterned_image(docs)
    return image_near_dups(imgs, max_hamming=3).select(
        "id_a", "id_b", F.col("hamming").cast("int").alias("hamming")
    )


@register(
    "multimodal_resize_real",
    oracle="""
    SELECT doc_id,
           CAST(8 * (2 + doc_id % 5) AS INTEGER) AS out_w,
           CAST(8 * (2 + doc_id % 3) AS INTEGER) AS out_h,
           CAST(54 + 3 * (8 * (2 + doc_id % 5)) * (8 * (2 + doc_id % 3))
                AS INTEGER) AS out_bytes,
           true AS ahash_preserved
    FROM documents
    """,
)
def multimodal_resize_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize, end-to-end checked: patterned BMPs decode →
    nearest-neighbor resample to a PER-DOCUMENT target resolution
    (8·(2+id%5) × 8·(2+id%3), the bucketed-resolution dataloader shape)
    → re-encode as valid BMPs → re-decode → perceptual hash, asserting
    the aHash survives the resize for every document (the property
    perceptual hashing is FOR). Targets are multiples of 8 ≥ 16, so the
    8×8-cell-aligned fixture patterns resample cell-exactly and the
    preservation holds with no tolerance. The oracle derives every
    row's dims and byte size from id arithmetic — out_bytes = 54 +
    3·w·h (rows of width 8k are already 4-byte aligned) — so the hash
    check bites on PER-ROW values, while Spark earns them through two
    full decode/encode round-trips. All three stages are map-only
    mapInPandas; the only shuffle is the doc_id hash-join of the two
    hash relations."""
    from csv2parquet_spark.operators.multimodal import (
        image_ahash,
        resize_images,
        with_patterned_image,
    )

    # gated rebalance BEFORE the synth (r11): all five Python-kernel
    # stages (synth, resize, 2× ahash, re-decode) otherwise run on the
    # single-file scan's ONE task; a no-op at scale
    docs = SCAN.parallelize_scan(
        table(spark, sf_dir, "documents").select("doc_id")
    )
    imgs = with_patterned_image(docs).localCheckpoint()
    # checkpointed: feeds both the final select AND its aHash — without
    # it the decode/resample/re-encode kernel executes twice per run
    targets = imgs.withColumn(
        "tw", (F.lit(8) * (F.lit(2) + F.col("doc_id") % 5)).cast("int")
    ).withColumn(
        "th", (F.lit(8) * (F.lit(2) + F.col("doc_id") % 3)).cast("int")
    )
    resized = resize_images(
        targets, target_w_col="tw", target_h_col="th"
    ).localCheckpoint()
    ha = image_ahash(imgs).select("doc_id", F.col("ahash").alias("h_orig"))
    hb = image_ahash(resized).select(
        "doc_id", F.col("ahash").alias("h_res")
    )
    return (
        resized.select("doc_id", "out_w", "out_h", "out_bytes")
        .join(ha, "doc_id")
        .join(hb, "doc_id")
        .select(
            "doc_id",
            "out_w",
            "out_h",
            "out_bytes",
            (F.col("h_orig") == F.col("h_res")).alias("ahash_preserved"),
        )
    )


@register(
    "audio_features_real",
    oracle="""
    SELECT doc_id,
           CAST(800 + (doc_id % 50) * 16 AS INTEGER) AS n_samples,
           CAST(8000 * (1 + doc_id % 3) AS INTEGER) AS sample_rate,
           CAST((800 + (doc_id % 50) * 16) * 1000
                // (8000 * (1 + doc_id % 3)) AS INTEGER) AS duration_ms,
           CAST(1000 + (doc_id % 7) * 100 AS INTEGER) AS rms,
           CAST(1000 + (doc_id % 7) * 100 AS INTEGER) AS peak,
           CAST((800 + (doc_id % 50) * 16 - 1)
                // (2 + doc_id % 6) AS INTEGER) AS zero_crossings
    FROM documents
    """,
)
def audio_features_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio feature extraction, end-to-end checked: square-wave
    PCM WAVs (synth_patterned_wav) parse through a true RIFF chunk walk
    into int16 samples, and the numpy DSP kernel computes RMS energy /
    peak / zero-crossing count / duration from the actual waveform —
    while the DuckDB oracle derives each value from id arithmetic (a
    square wave's RMS is exactly its amplitude; crossings are
    ⌊(n−1)/half_period⌋). Map-only mapInPandas: synth + parse + DSP,
    no shuffle anywhere."""
    from csv2parquet_spark.operators.multimodal import (
        audio_features,
        with_patterned_wav,
    )

    # NO scan rebalance here (r11 measured negative): the DSP kernel is
    # light enough that the exchange + 32-task dispatch cost MORE than
    # the single-task kernel (0.70 → 1.14 s); contrast resize/ahash.
    docs = table(spark, sf_dir, "documents").select("doc_id")
    return audio_features(with_patterned_wav(docs))


@register(
    "video_frame_sample_real",
    oracle="""
    SELECT doc_id, CAST(fi AS INTEGER) AS frame_idx,
           CAST(4 + doc_id % 5 AS INTEGER) AS n_frames,
           CAST(768 AS INTEGER) AS frame_bytes,
           CAST(CASE (3 - (doc_id + fi) % 3) % 3
                WHEN 0 THEN 1317624576693539401
                WHEN 1 THEN 2635249153387078802
                ELSE 5270498306774157604 END AS BIGINT) AS ahash
    FROM documents,
         LATERAL (SELECT unnest(range(0, 4 + doc_id % 5, 2)) AS fi) _f
    """,
)
def video_frame_sample_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video frame sampling, end-to-end checked: spec-correct
    uncompressed AVIs (RIFF hdrl/strl/movi with one '00db' DIB chunk
    per frame) parse through a recursive chunk walk; every 2nd frame's
    pixels hash through the aHash kernel. The per-(doc, frame) pattern
    bit c is set iff (c + doc + frame) % 3 == 0 (c < 63), whose bit-sum
    collapses to one of THREE closed-form constants by residue — so the
    DuckDB oracle rebuilds every sampled frame's hash from arithmetic
    while Spark earns it by decoding actual frame bytes. Map-only
    mapInPandas; no shuffle."""
    from csv2parquet_spark.operators.multimodal import (
        sample_frames_real,
        with_patterned_avi,
    )

    # parallelize_scan at this head measured a WASH on wall and 13x on
    # executor time (r11 A/B: 1-task 1.77 s exec / 1.31 s wall vs
    # 32-task 22.7 s exec / 1.31-1.40 s wall) — the doubly-chained
    # mapInPandas pays its per-task Arrow/worker constant twice per
    # task, which at 32 near-empty tasks dwarfs the kernel. Stays
    # serial-scan like the other light multimodal kernels.
    docs = table(spark, sf_dir, "documents").select("doc_id")
    return sample_frames_real(with_patterned_avi(docs), every=2)


@register(
    "image_features_real",
    oracle="""
    SELECT doc_id,
           CAST(CASE doc_id % 3 WHEN 0 THEN 6 ELSE 5 END AS INTEGER) AS q0,
           CAST(CASE doc_id % 3 WHEN 2 THEN 6 ELSE 5 END AS INTEGER) AS q1,
           CAST(CASE doc_id % 3 WHEN 1 THEN 6 ELSE 5 END AS INTEGER) AS q2,
           CAST(5 AS INTEGER) AS q3,
           CAST(21 AS INTEGER) AS bright_cells
    FROM documents
    """,
)
def image_features_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image feature extraction, end-to-end checked: 16×16 BMPs
    rendering the (c + id) % 3 cell pattern decode through the real
    pixel parser, and the quadrant-histogram features (bright cells per
    4×4-cell spatial bin) come out of actual bytes — while the oracle
    derives each quadrant's count from the closed-form residue classes
    (the pattern puts 6 bright cells in exactly one quadrant per
    residue, 5 elsewhere; 21 total always). Replaces the last image
    STUB (the sha-derived fake feature vector stays as the documented
    plumbing twin). Map-only mapInPandas."""
    from csv2parquet_spark.operators.multimodal import (
        image_features,
        with_counting_image,
    )

    # NO scan rebalance here (r11 measured negative): the feature kernel
    # is light enough that the exchange + 32-task dispatch cost MORE
    # than the single-task kernel (0.67 → 0.93 s); contrast resize/ahash.
    docs = table(spark, sf_dir, "documents").select("doc_id")
    return image_features(with_counting_image(docs))


@register(
    "hard_negative_mining",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qv, label AS qlabel
      FROM embeddings WHERE vec_id % 250 = 0 AND vec_id < 2000
    ), scored AS (
      SELECT q.query_id, v.vec_id,
             round({_sql_cosine('v.embedding', 'q.qv')}, 6) AS sim
      FROM embeddings v, q
      WHERE v.label <> q.qlabel
    )
    SELECT query_id, vec_id, sim,
           CAST(row_number() OVER (
             PARTITION BY query_id ORDER BY sim DESC, vec_id) AS INT)
             AS neg_rank
    FROM scored
    QUALIFY neg_rank <= 3
    """,
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor,
    the top-3 most-similar vectors with a DIFFERENT label — the
    near-miss negatives that make embedding models learn boundaries
    (the batch-mining pass every retrieval/rerank training pipeline
    runs over its corpus).

    Same scale shape as the batch kNN join (one corpus pass, anchors
    broadcast with precomputed norms, WindowGroupLimit partial top-k
    below the exchange) with the label-inequality filter applied
    MAP-SIDE before anything shuffles — the shuffle carries at most
    k rows per anchor per partition, and the corpus×anchors product
    never materializes.

    The anchor set is a FIXED PANEL (the sf0.1 anchor ids, vec_id <
    2000 — a no-op filter at sf <= 0.1), not a corpus-proportional
    sample: real mining fixes the anchor/eval panel while the corpus
    grows, and a proportional panel made the operator look quadratic
    at sf1 purely by fixture construction (VERDICT r8 item 4).
    """
    e = table(spark, sf_dir, "embeddings")
    anchors = e.filter(
        (F.col("vec_id") % 250 == 0) & (F.col("vec_id") < 2000)
    ).select(F.col("vec_id").alias("query_id"), "embedding", "label")
    return S.knn_join(
        e,
        anchors,
        k=3,
        query_cols=["label"],
        pair_filter=F.col("label") != F.col("__q_label"),
    ).withColumnRenamed("knn_rank", "neg_rank")


@register(
    "entity_resolution_customers",
    oracle="""
    WITH RECURSIVE recs AS (
      SELECT CAST(c_custkey * 3 AS BIGINT) AS rec_id, c_name AS name
      FROM customer
      UNION ALL
      SELECT CAST(c_custkey * 3 + 1 AS BIGINT),
             replace(c_name, '#', '-')
      FROM customer WHERE c_custkey % 5 = 0
      UNION ALL
      SELECT CAST(c_custkey * 3 + 2 AS BIGINT),
             replace(replace(c_name, '#', '-'), 'C', 'K')
      FROM customer WHERE c_custkey % 10 = 0
    ), cand AS (
      SELECT a.rec_id AS id_a, b.rec_id AS id_b
      FROM recs a JOIN recs b
        ON right(a.name, 6) = right(b.name, 6)
       AND a.rec_id < b.rec_id
       AND levenshtein(a.name, b.name) <= 1
    ), edges AS (
      SELECT id_a AS a, id_b AS b FROM cand
      UNION SELECT id_b, id_a FROM cand
    ), reach AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ), comp AS (
      SELECT a AS id, least(a, min(b)) AS component FROM reach GROUP BY a
    )
    SELECT r.rec_id,
           COALESCE(c.component, r.rec_id) AS canonical_id,
           (COALESCE(c.component, r.rec_id) = r.rec_id) AS is_canonical
    FROM recs r LEFT JOIN comp c ON c.id = r.rec_id
    """,
)
def entity_resolution_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end-to-end: a dirty customer registry (every
    clean record, plus one and sometimes two corrupted name variants)
    is resolved to canonical entities via block → fuzzy-match →
    TRANSITIVE CLOSURE. The fixture is built so closure genuinely
    matters: clean↔variant1 and variant1↔variant2 are edit-distance 1
    but clean↔variant2 is 2 — pairwise matching alone would split the
    entity; connected components reunite it (the standard ER
    non-transitivity trap).

    Scale shape: blocking on the name's stable digit suffix keys the
    candidate self-join — block sizes are bounded (≤3 here; bounded by
    the blocking design generally), so the join is never corpus²;
    Levenshtein runs only within blocks; components iterate on the
    match graph (a tiny fraction of the registry); final assignment is
    one left join. The DuckDB oracle recomputes the same closure with
    a recursive CTE.
    """
    c = table(spark, sf_dir, "customer")
    key = F.col("c_custkey").cast("long")
    r0 = c.select((key * 3).alias("rec_id"), F.col("c_name").alias("name"))
    r1 = c.filter(key % 5 == 0).select(
        (key * 3 + 1).alias("rec_id"),
        F.expr("replace(c_name, '#', '-')").alias("name"),
    )
    r2 = c.filter(key % 10 == 0).select(
        (key * 3 + 2).alias("rec_id"),
        F.expr("replace(replace(c_name, '#', '-'), 'C', 'K')").alias("name"),
    )
    recs = r0.unionByName(r1).unionByName(r2)
    blocked = recs.withColumn("block", F.expr("right(name, 6)"))
    a = blocked.select(
        F.col("rec_id").alias("id_a"), F.col("name").alias("name_a"), "block"
    )
    b = blocked.select(
        F.col("rec_id").alias("id_b"), F.col("name").alias("name_b"), "block"
    )
    pairs = (
        a.join(b, "block")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.levenshtein("name_a", "name_b") <= 1)
        )
        .select("id_a", "id_b")
    )
    comp = D.connected_components(pairs)
    return (
        recs.join(comp.withColumnRenamed("id", "rec_id"), "rec_id", "left")
        .select(
            "rec_id",
            F.coalesce(F.col("component"), F.col("rec_id")).alias(
                "canonical_id"
            ),
            (
                F.coalesce(F.col("component"), F.col("rec_id"))
                == F.col("rec_id")
            ).alias("is_canonical"),
        )
    )


@register(
    "incremental_dedup_report",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
      FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i)
    ), sz AS (
      SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
    ), common AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), pairs AS (
      SELECT id_a, id_b
      FROM common JOIN sz sa ON sa.doc_id = id_a
                  JOIN sz sb ON sb.doc_id = id_b
      WHERE round(CAST(common AS DOUBLE)
                  / (sa.sz + sb.sz - common), 6) >= 0.8
    ), cross_pairs AS (
      SELECT CASE WHEN id_a % 7 = 0 THEN id_a ELSE id_b END AS new_id
      FROM pairs
      WHERE (id_a % 7 = 0) <> (id_b % 7 = 0)
    ), near AS (
      SELECT new_id AS doc_id, count(*) AS n_near_dups
      FROM cross_pairs GROUP BY new_id
    ), old_md5 AS (
      -- NULL contract (r11): NULL text is never an exact dup — keep
      -- NULL hashes out of the IN-list and coalesce the three-valued
      -- NULL IN (...) result to FALSE, matching the engine's left-semi
      -- screen (where a NULL hash simply never matches).
      SELECT DISTINCT md5(text) AS h FROM documents
      WHERE doc_id % 7 <> 0 AND text IS NOT NULL
    )
    SELECT d.doc_id,
           coalesce(md5(d.text) IN (SELECT h FROM old_md5), FALSE)
             AS is_exact_dup,
           coalesce(near.n_near_dups, 0) AS n_near_dups,
           CASE WHEN coalesce(md5(d.text) IN (SELECT h FROM old_md5), FALSE)
                  THEN 'exact'
                WHEN coalesce(near.n_near_dups, 0) > 0 THEN 'near'
                ELSE 'unique' END AS verdict
    FROM documents d LEFT JOIN near ON near.doc_id = d.doc_id
    WHERE d.doc_id % 7 = 0
    """,
)
def incremental_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL dedup — the shape a production ingest actually runs:
    a NEW batch (doc_id % 7 = 0 here) is screened against the EXISTING
    corpus, never against itself, and each new document gets a
    disposition: ``exact`` (byte-identical text already ingested —
    md5 semi-join against the corpus hash set), ``near`` (>= 0.8
    3-gram Jaccard against some corpus doc — the PPJoin pair machinery
    restricted to batch×corpus pairs), or ``unique`` (safe to ingest).

    Scale shape: the md5 screen shuffles 16-byte hashes; the near-dup
    screen reuses the prefix-filtered shingle join (never corpus²) and
    keeps only cross-split pairs, so intra-corpus duplicates — already
    resolved in earlier ingests — cost nothing downstream of the pair
    filter. At 100 TB the corpus side's hash set and shingle index are
    the precomputed artifacts an ingest pipeline maintains between
    batches.
    """
    docs = table(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % 7 == 0
    # candidate-stage pair filter: corpus-internal (and batch-internal)
    # pairs are dropped BEFORE the exact-Jaccard verify — in the
    # incremental setting corpus-internal near-dups dominate the pair
    # space and were already resolved by earlier ingests.
    pairs = D.ngram_jaccard_pairs(
        docs,
        threshold=0.8,
        order="hash",
        pair_filter=(F.col("id_a") % 7 == 0) != (F.col("id_b") % 7 == 0),
    ).select("id_a", "id_b")
    cross = pairs.select(
        F.when(F.col("id_a") % 7 == 0, F.col("id_a"))
        .otherwise(F.col("id_b"))
        .alias("doc_id")
    )
    near = cross.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_near_dups"))
    old_md5 = docs.filter(~is_new).select(F.md5("text").alias("h")).distinct()
    new_docs = docs.filter(is_new).select("doc_id", F.md5("text").alias("h"))
    exact = new_docs.join(old_md5, "h", "left_semi").select(
        "doc_id", F.lit(True).alias("is_exact_dup")
    )
    return (
        new_docs.select("doc_id")
        .join(exact, "doc_id", "left")
        .join(near, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("is_exact_dup"), F.lit(False)).alias(
                "is_exact_dup"
            ),
            F.coalesce(F.col("n_near_dups"), F.lit(0)).alias("n_near_dups"),
        )
        .withColumn(
            "verdict",
            F.when(F.col("is_exact_dup"), "exact")
            .when(F.col("n_near_dups") > 0, "near")
            .otherwise("unique"),
        )
    )


@register(
    "dedup_keep_best_quality",
    oracle="""
    WITH RECURSIVE toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
      FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i)
    ), sz AS (
      SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
    ), common AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), pairs AS (
      SELECT id_a, id_b
      FROM common JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
      WHERE round(CAST(common AS DOUBLE) / (sa.sz + sb.sz - common), 6) >= 0.8
    ), edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ), reach AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ), comp AS (
      SELECT a AS id, least(a, min(b)) AS component FROM reach GROUP BY a
    ), alldocs AS (
      SELECT d.doc_id, d.n_chars, COALESCE(c.component, d.doc_id) AS component
      FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
    ), ranked AS (
      SELECT component, doc_id, n_chars,
             row_number() OVER (PARTITION BY component
                                ORDER BY n_chars DESC, doc_id) AS rn,
             count(*) OVER (PARTITION BY component) AS n_members
      FROM alldocs
    )
    SELECT component, doc_id AS kept_doc_id,
           CAST(n_chars AS BIGINT) AS kept_n_chars,
           CAST(n_members AS BIGINT) AS n_members
    FROM ranked WHERE rn = 1
    """,
)
def dedup_keep_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KEEP decision that completes near-dedup: one row per
    near-dup cluster naming WHICH copy survives — the longest document
    (n_chars, ties to the lower doc_id), not the arbitrary first-seen.
    This is the production choice in corpus pipelines (keep the most
    complete variant of a boilerplate-expanded page); singleton docs
    are their own component, so the output is the corpus's full
    keep-list.

    Scale shape: exact-Jaccard pairs via the PPJoin prefix filter
    (never corpus²) → connected components on the pair graph (min-label
    propagation — component ids are model-sized) → ONE hash exchange on
    component shared by the row_number ranking and the member-count
    window. Oracle: the proven dedup_clusters recursive-closure chain
    plus the same keep-rule window."""
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    # hash prefix order (the ngram_jaccard_near_dups choice): zero extra
    # shuffles and identical output on this corpus's near-uniform
    # shingle frequencies; rare_first stays the operator default
    pairs = D.ngram_jaccard_pairs(
        docs, threshold=0.8, order="hash"
    ).select("id_a", "id_b")
    cc = D.connected_components(pairs).withColumnRenamed("id", "doc_id")
    full = (
        docs.select("doc_id", "n_chars")
        .join(cc, "doc_id", "left")
        .withColumn("component", F.coalesce("component", F.col("doc_id")))
    )
    w = Window.partitionBy("component").orderBy(F.desc("n_chars"), "doc_id")
    ranked = full.select(
        "component",
        "doc_id",
        "n_chars",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("component")).alias("n_members"),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "component",
        F.col("doc_id").alias("kept_doc_id"),
        F.col("n_chars").cast("long").alias("kept_n_chars"),
        F.col("n_members").cast("long").alias("n_members"),
    )


@register(
    "containment_near_dups",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
      FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i)
    ), sz AS (
      SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
    ), common AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, common, sa.sz AS sz_a, sb.sz AS sz_b,
           round(CAST(common AS DOUBLE) / sa.sz, 6) AS containment
    FROM common JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
    WHERE CAST(common AS DOUBLE) / sa.sz >= 0.9
    """,
)
def containment_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional subset-duplicate pairs: documents whose 3-gram
    shingle set is ≥90% CONTAINED in another document's — the
    quote/excerpt/boilerplate-wrap case that symmetric Jaccard misses
    (a short doc inside a long one has tiny Jaccard but containment
    ≈ 1). See operators/dedup.py:containment_pairs for the one-sided
    prefix-filter scale argument (A's pigeonhole prefix joins B's full
    shingle relation; never corpus²)."""
    return D.containment_pairs(
        table(spark, sf_dir, "documents"), threshold=0.9
    )


@register(
    "content_defined_chunks",
    oracle="""
    WITH base AS (
      SELECT doc_id, text AS t, length(text) AS n FROM documents
    ), h AS (
      SELECT doc_id, n,
        CASE WHEN n >= 5 THEN list_transform(range(1, n - 3), i ->
          ((((CAST(ascii(t[i]) AS BIGINT) * 257 + ascii(t[i+1])) * 257
             + ascii(t[i+2])) * 257 + ascii(t[i+3])) * 257 + ascii(t[i+4])))
        ELSE [] END AS hashes
      FROM base
    ), cuts AS (
      SELECT doc_id, n,
        list_filter(list_transform(range(1, len(hashes) + 1), i ->
          CASE WHEN hashes[i] % 64 = 0 AND i + 4 < n THEN CAST(i + 4 AS BIGINT)
          END), x -> x IS NOT NULL) AS cut_pos
      FROM h
    ), lens AS (
      SELECT doc_id, n, cut_pos,
        list_transform(range(1, len(cut_pos) + 2), i ->
          (CASE WHEN i <= len(cut_pos) THEN cut_pos[i]
                ELSE CAST(n AS BIGINT) END)
          - (CASE WHEN i = 1 THEN 0 ELSE cut_pos[i - 1] END)) AS clens
      FROM cuts
    )
    SELECT doc_id, CAST(len(clens) AS BIGINT) AS n_chunks,
           CAST(list_min(clens) AS BIGINT) AS min_chunk,
           CAST(list_max(clens) AS BIGINT) AS max_chunk,
           CAST(n AS BIGINT) AS total_chars,
           md5(coalesce(array_to_string(cut_pos, ','), '')) AS cuts_digest
    FROM lens
    """,
)
def content_defined_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTENT-DEFINED chunking (the rsync/LBFS/FastCDC family): chunk
    boundaries fall where the Karp-Rabin rolling 5-gram hash ≡ 0
    (mod 64) — so boundaries depend only on LOCAL content, and an
    insertion near the start of a document shifts at most one chunk
    instead of re-aligning every fixed-size block. This is the chunking
    that makes chunk-level dedup robust to edits (fixed-size chunks
    lose all alignment after one inserted byte).

    Map-only at any scale: the rolling hash, boundary filter, and
    chunk-length diffs are all per-row Catalyst array expressions over
    the winnowing hash machinery (exact BIGINT polynomial, no modulus
    overflow at 5 ASCII chars) — zero KEY shuffles, and the output
    carries an md5 digest of the cut positions so the oracle hash bites
    on every boundary, not just the counts. The input goes through the
    gated round-robin rebalance (``operators.scan.parallelize_scan``): the
    per-char HOF work is CPU-bound, and the single-file local fixture
    otherwise runs the whole stage on ONE task (6 s → ~0.6 s on 32
    cores); at scale the scan already has thousands of tasks and the
    gate never fires."""
    c = F.col("text")
    codes = F.transform(F.split(c, ""), lambda ch: F.ascii(ch).cast("bigint"))
    n = F.length(c)
    m = F.greatest(n - F.lit(4), F.lit(0))
    parts = [F.slice(codes, i + 1, m) for i in range(5)]
    h = parts[0]
    for p in parts[1:]:
        h = F.zip_with(h, p, lambda a, b: a * 257 + b)
    hashes = F.when(n >= 5, h).otherwise(F.array().cast("array<bigint>"))
    cuts = F.filter(
        F.transform(
            hashes,
            lambda x, i: F.when(
                (x % 64 == 0) & (i + 5 < n), (i + 5).cast("bigint")
            ),
        ),
        lambda x: x.isNotNull(),
    )
    ends = F.concat(cuts, F.array(n.cast("bigint")))
    starts = F.concat(F.array(F.lit(0).cast("bigint")), cuts)
    clens = F.zip_with(ends, starts, lambda a, b: a - b)
    d = SCAN.parallelize_scan(table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.size(clens).cast("long").alias("n_chunks"),
        F.array_min(clens).alias("min_chunk"),
        F.array_max(clens).alias("max_chunk"),
        n.cast("long").alias("total_chars"),
        F.md5(F.concat_ws(",", F.transform(cuts, lambda x: x.cast("string")))).alias(
            "cuts_digest"
        ),
    )


@register(
    "source_overlap_matrix",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
      FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i)
    ), sz AS (
      SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
    ), common AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
      GROUP BY 1, 2
    ), pairs AS (
      SELECT id_a, id_b,
             round(CAST(common AS DOUBLE) / sa.sz, 6) AS containment
      FROM common JOIN sz sa ON sa.doc_id = id_a
      WHERE CAST(common AS DOUBLE) / sa.sz >= 0.9
    )
    SELECT da.source AS source_a, db.source AS source_b,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(CAST(sum(CAST(p.containment AS DECIMAL(18,6))) AS DOUBLE)
                 / count(*), 6) AS avg_containment
    FROM pairs p
    JOIN documents da ON da.doc_id = p.id_a
    JOIN documents db ON db.doc_id = p.id_b
    GROUP BY da.source, db.source
    """,
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Provenance analysis: WHICH sources copy from which — the
    containment pair graph rolled up to a (source_contained,
    source_container) matrix with pair counts and mean containment.
    This is the dataset-governance view of dedup output (is one crawl
    a mirror of another? does a source boilerplate-wrap a sibling?),
    and the first question a data audit asks after pair-level dedup.

    Scale shape: the pair relation (already never-corpus², see
    containment_pairs) joins the doc→source map twice — at scale both
    are broadcastable slices of the doc-metadata relation — then one
    partial-aggregated rollup on the source-pair key (model-sized:
    |sources|²). Mean containment sums in DECIMAL so partial-agg order
    can't perturb the 6 dp round."""
    docs = table(spark, sf_dir, "documents")
    pairs = D.containment_pairs(docs, threshold=0.9).select(
        "id_a", "id_b", "containment"
    )
    src = docs.select("doc_id", "source")
    return (
        pairs.join(
            src.select(
                F.col("doc_id").alias("id_a"), F.col("source").alias("source_a")
            ),
            "id_a",
        )
        .join(
            src.select(
                F.col("doc_id").alias("id_b"), F.col("source").alias("source_b")
            ),
            "id_b",
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(
                F.sum(F.col("containment").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_containment"),
        )
    )


def _dedup_threshold_oracle() -> str:
    """Threshold-sweep oracle: ONE shared shingle/overlap computation,
    then per-threshold pair filters, recursive-CTE closures, and
    cluster rollups, unioned. Thresholds are emitted as integer
    percents so the hashed output carries no floats."""
    shared = """
    WITH RECURSIVE toks AS MATERIALIZED (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), sh AS MATERIALIZED (
      SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
      FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i)
    ), sz AS MATERIALIZED (
      SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
    ), common AS MATERIALIZED (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             round(CAST(count(*) AS DOUBLE)
                   / (any_value(sa.sz) + any_value(sb.sz) - count(*)), 6) AS j
      FROM sh a
      JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      JOIN sz sa ON sa.doc_id = a.doc_id
      JOIN sz sb ON sb.doc_id = b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )"""
    blocks, selects = [], []
    for pct in (70, 80, 90):
        t = pct / 100
        blocks.append(f"""
    , pairs{pct} AS MATERIALIZED (
      SELECT id_a, id_b FROM common WHERE j >= {t}
    ), edges{pct} AS MATERIALIZED (
      SELECT id_a AS a, id_b AS b FROM pairs{pct}
      UNION SELECT id_b, id_a FROM pairs{pct}
    ), reach{pct} AS (
      SELECT a, b FROM edges{pct}
      UNION
      SELECT r.a, e.b FROM reach{pct} r JOIN edges{pct} e ON r.b = e.a
    ), comp{pct} AS MATERIALIZED (
      SELECT a AS id, least(a, min(b)) AS component
      FROM reach{pct} GROUP BY a
    )""")
        selects.append(f"""
    SELECT CAST({pct} AS INT) AS threshold_pct,
           (SELECT CAST(count(*) AS BIGINT) FROM pairs{pct}) AS n_pairs,
           CAST(count(*) AS BIGINT) AS n_docs_in_clusters,
           CAST(count(DISTINCT component) AS BIGINT) AS n_clusters,
           CAST(coalesce(max(csz), 0) AS BIGINT) AS max_cluster
    FROM comp{pct}
    JOIN (SELECT component AS c2, count(*) AS csz
          FROM comp{pct} GROUP BY 1) m ON m.c2 = comp{pct}.component""")
    return shared + "".join(blocks) + (" UNION ALL ".join(selects))


@register("dedup_threshold_sensitivity", oracle=_dedup_threshold_oracle())
def dedup_threshold_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup knob-tuning audit: how the near-dup cluster structure
    moves as the Jaccard threshold sweeps 0.7 → 0.8 → 0.9 — pair
    count, docs absorbed into clusters, cluster count, and largest
    cluster per setting. This is the sensitivity table a pipeline owner
    reads before committing to a threshold (a cliff between two rows
    means the corpus has a near-dup band right at that similarity).

    ONE PPJoin pass at the loosest threshold computes every pair once
    (pairs at 0.8/0.9 are subsets — filter, don't recompute); each
    threshold then runs connected components over its (small) pair
    graph. The corpus-sized work is paid once; the sweep costs three
    CC closures over pair-graph-sized relations."""
    docs = table(spark, sf_dir, "documents")
    # The PPJoin pass runs a hair BELOW 0.70 so the per-tier filters on
    # the ROUNDED jaccard column match the oracle's round(j,6) >= t
    # predicate at every tier, including 70 (ADVICE r6: thresholding the
    # base at unrounded 0.7 dropped pairs within 5e-7 below 0.7 that the
    # oracle's rounded predicate admits; the 80/90 tiers were already
    # rounded-to-rounded).
    base = (
        D.ngram_jaccard_pairs(docs, threshold=0.7 - 1e-6, order="hash")
        .select("id_a", "id_b", "jaccard")
        .localCheckpoint()
    )
    outs = []
    for pct in (70, 80, 90):
        pairs = base.filter(F.col("jaccard") >= pct / 100).select("id_a", "id_b")
        comp = D.connected_components(pairs)
        sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("csz"))
        outs.append(
            comp.join(sizes, "component")
            .agg(
                F.lit(pct).cast("int").alias("threshold_pct"),
                F.count(F.lit(1)).alias("n_docs_in_clusters"),
                F.countDistinct("component").alias("n_clusters"),
                F.coalesce(F.max("csz"), F.lit(0)).cast("long").alias("max_cluster"),
            )
            .crossJoin(
                F.broadcast(pairs.agg(F.count(F.lit(1)).alias("n_pairs")))
            )
            .select(
                "threshold_pct", "n_pairs", "n_docs_in_clusters",
                "n_clusters", "max_cluster",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
