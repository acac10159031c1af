"""Deduplication operators (SURVEY.md §2.8): exact, MinHash+LSH, SimHash,
n-gram Jaccard.

Scale design (the point of each implementation):

* **Exact dedup** groups on a hash of the text, not the text itself —
  the shuffle moves 16-byte keys, not documents. At 100 TB this is the
  difference between a feasible and an infeasible exchange.
* **MinHash+LSH** is pure DataFrame ops: explode shingles →
  ``xxhash64(shingle, seed_i)`` per permutation → min per doc → band →
  groupBy band signature → pair join. No driver state, no ML-lib fit;
  every stage is a hash shuffle that AQE can coalesce or skew-split.
  Candidate pairs are then verified with exact Jaccard so the output is
  seeded-deterministic.
* **SimHash** aggregates per-bit sign counts with a single groupBy
  (64 conditional sums), reconstructs the 64-bit signature, and blocks
  on 16-bit bands for Hamming-distance candidate generation.
* All pair-joins emit ``a < b`` once, and block within a cheap
  partition key (band / bucket) so the join never goes quadratic in the
  corpus, only in the bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csv2parquet_spark.operators.text import shingles, tokens


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep-first exact dedup: one row per distinct text, smallest id wins.

    Returns (keep_id, n_copies, fp) — fp = md5 of the text.
    """
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
        .select("keep_id", "n_copies", "fp")
    )


def shingle_sets(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                 k: int = 3) -> DataFrame:
    """(id, shingle) distinct pairs — the input relation for Jaccard/MinHash."""
    return (
        df.select(F.col(id_col).alias("id"), F.explode(shingles(tokens(text_col), k)).alias("shingle"))
        .distinct()
    )


def _verify_jaccard(cand: DataFrame, sh: DataFrame, threshold: float) -> DataFrame:
    """Exact Jaccard for candidate (id_a, id_b) pairs against the full
    shingle relation; emits pairs with J ≥ threshold."""
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), "shingle")
    common = (
        cand.join(a, "id_a")
        .join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("common"))
    )
    return (
        common.join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("common").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "common", "sz_a", "sz_b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    prefix_filter: bool = True,
) -> DataFrame:
    """Exact n-gram Jaccard similarity join (all pairs with J ≥ threshold).

    With ``prefix_filter`` (the scale path — the PPJoin/AllPairs prefix
    principle from the set-similarity-join literature): order each doc's
    shingles rarest-first globally; two sets with J ≥ t must share a
    shingle within each other's first ``|A| - ceil(t·|A|) + 1`` shingles,
    so the candidate self-join runs only on those prefixes. Rare-first
    ordering makes prefix join keys low-frequency — the hot-key blowup of
    a naive shingle self-join (vocabulary³ keys shared by thousands of
    docs) disappears, and the verify step touches only surviving pairs.
    Output is EXACT either way (verification recomputes true Jaccard).
    """
    sh = shingle_sets(df, text_col, id_col, k)
    if not prefix_filter:
        a = sh.select(F.col("id").alias("id_a"), "shingle")
        b = sh.select(F.col("id").alias("id_b"), "shingle")
        cand = (
            a.join(b, "shingle")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        return _verify_jaccard(cand, sh, threshold)

    from pyspark.sql import Window

    sh = sh.cache()
    freq = sh.groupBy("shingle").agg(F.count("*").alias("df_freq"))
    w = Window.partitionBy("id").orderBy("df_freq", "shingle")
    ranked = (
        sh.join(freq, "shingle")
        .withColumn("pos", F.row_number().over(w))
        .withColumn("sz", F.count("*").over(Window.partitionBy("id")))
    )
    prefix = ranked.filter(
        F.col("pos") <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1
    ).select("id", "shingle")
    a = prefix.select(F.col("id").alias("id_a"), "shingle")
    b = prefix.select(F.col("id").alias("id_b"), "shingle")
    cand = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return _verify_jaccard(cand, sh, threshold)


def _minhash_signatures_from_shingles(sh: DataFrame, num_perm: int) -> DataFrame:
    mins = [
        F.min(F.xxhash64("shingle", F.lit(i))).alias(f"h{i}") for i in range(num_perm)
    ]
    sig = sh.groupBy("id").agg(*mins)
    return sig.select("id", F.array(*[f"h{i}" for i in range(num_perm)]).alias("sig"))


def minhash_signatures(
    df: DataFrame,
    num_perm: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """MinHash signatures: (id, array<bigint> sig[num_perm]).

    Permutation i is ``xxhash64(shingle, seed=i)``; the signature is the
    per-doc min of each. One explode + one groupBy — the groupBy carries
    num_perm partial mins, so the shuffle is (id, num_perm·8 bytes).
    """
    return _minhash_signatures_from_shingles(
        shingle_sets(df, text_col, id_col, k), num_perm
    )


def minhash_lsh_candidates(
    sig_df: DataFrame, num_perm: int = 32, bands: int = 8
) -> DataFrame:
    """LSH banding: split the signature into ``bands`` rows of
    ``num_perm // bands`` hashes, bucket by (band_idx, band_hash), and
    emit candidate pairs per bucket. Pairs are distinct (id_a < id_b)."""
    rows_per_band = num_perm // bands
    band_arrays = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(*[F.element_at("sig", b * rows_per_band + r + 1)
                             for r in range(rows_per_band)]).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    buckets = sig_df.select("id", F.explode(band_arrays).alias("bb")).select(
        "id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    a = buckets.select(F.col("id").alias("id_a"), "band", "bucket")
    b = buckets.select(F.col("id").alias("id_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_near_dups(
    df: DataFrame,
    threshold: float = 0.5,
    num_perm: int = 32,
    bands: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """MinHash-LSH near-dup pipeline with exact-Jaccard verification of
    candidates (so the result is deterministic given the seeds)."""
    sh = shingle_sets(df, text_col, id_col, k).cache()
    sig = _minhash_signatures_from_shingles(sh, num_perm)
    cand = minhash_lsh_candidates(sig, num_perm, bands)
    return _verify_jaccard(cand, sh, threshold).select("id_a", "id_b", "jaccard")


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """64-bit SimHash per document.

    Token hash = xxhash64(token); bit b of the signature is the sign of
    Σ(±1) over tokens for that bit. One explode + one groupBy with
    ``bits`` conditional sums — stays in codegen, shuffles only
    (id, bits·8B) partials.
    """
    tok = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("token")
    ).withColumn("h", F.xxhash64("token"))
    def mask(b: int) -> int:
        # bit 63 of a signed 64-bit long is the sign bit: use the signed
        # two's-complement value (1<<63 would overflow LongType).
        return (1 << b) if b < 63 else -(1 << 63)

    bit_sums = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.lit(mask(b))) != 0, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(bits)
    ]
    agg = tok.groupBy("id").agg(*bit_sums)
    sig = F.lit(0).cast("bigint")
    for b in range(bits):
        sig = sig + F.when(F.col(f"b{b}") > 0, F.lit(mask(b)).cast("bigint")).otherwise(0)
    return agg.select("id", sig.alias("simhash"))


def simhash_near_dups(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """SimHash near-dup pairs: block on 4×16-bit bands (any pair within
    Hamming ≤ 3 of 64 bits shares at least one exact 16-bit band by
    pigeonhole over 4 bands), then verify Hamming via bit_count(xor)."""
    sig = simhash_signatures(df, text_col, id_col).cache()
    band_arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned("simhash", b * 16).bitwiseAND(F.lit(0xFFFF)).alias("bucket"),
            )
            for b in range(4)
        ]
    )
    buckets = sig.select("id", "simhash", F.explode(band_arr).alias("bb")).select(
        "id", "simhash", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    a = buckets.select(F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"), "band", "bucket")
    b = buckets.select(F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
