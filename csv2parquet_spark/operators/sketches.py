"""Mergeable sketches as plain DataFrames (SURVEY.md §2.8 "a novel
sketch"): a Count-Min sketch over a token stream.

The sketch IS a tiny DataFrame (depth × width counter cells), built by
one partial-aggregate-friendly groupBy — the map side reduces each
partition to ≤ depth·width cells before the shuffle, so sketch
construction over 100 TB of text shuffles kilobytes. Sketches merge by
unioning cell tables and re-summing (the operation distributive
aggregation gives for free), which is what makes the structure useful
for per-day / per-shard rollups.

Hash functions are the 4 disjoint 8-hex-char slices of md5(token):
deterministic, engine-independent (DuckDB reproduces them exactly — the
oracle in queries/sketches_q.py is generated from the same constants),
and uniform enough for counter bucketing. At production scale swap in
xxhash64(token, seed_k) — same plan shape, cheaper hashing, no oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 4  # md5 yields 4 disjoint 32-bit slices
CMS_WIDTH = 1024


def cms_bucket(col: Column, k: int, width: int = CMS_WIDTH) -> Column:
    """Hash-k bucket id: 32-bit slice k of md5, mod width."""
    if not 0 <= k <= 3:
        # md5 has exactly four disjoint 8-hex slices; substring past
        # char 32 is empty and conv('') is NULL — downstream that NULL
        # silently dropped lookups and produced universal Bloom false
        # negatives (review r8). More hash functions need a second
        # hash source, not a silent NULL.
        raise ValueError(
            f"cms_bucket: hash index {k} out of range (md5 provides 4 "
            "disjoint 32-bit slices, k must be 0..3)"
        )
    return (
        F.conv(F.substring(F.md5(col), 1 + 8 * k, 8), 16, 10).cast("long") % width
    )


def cms_build(
    tokens: DataFrame,
    col: str = "token",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(k, b, c): the Count-Min counter table from a token stream.

    The explode multiplies rows by ``depth`` map-side, but partial
    aggregation collapses every partition to ≤ depth·width cells before
    the single tiny shuffle.
    """
    rows = tokens.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("k"),
                        cms_bucket(F.col(col), k, width).alias("b"),
                    )
                    for k in range(depth)
                ]
            )
        ).alias("kb")
    )
    return (
        rows.select("kb.k", "kb.b")
        .groupBy("k", "b")
        .agg(F.count("*").alias("c"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Union counter tables and re-sum — the distributive merge."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("k", "b").agg(F.sum("c").alias("c"))


def cms_lookup(
    sketch: DataFrame,
    queries: DataFrame,
    col: str = "token",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point estimates for ``queries[col]``: min over the depth counter
    cells each token hashes to. The sketch is broadcast (≤ depth·width
    rows); estimates are upper bounds (CMS never undercounts)."""
    q = queries.select(
        F.col(col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("k"),
                        cms_bucket(F.col(col), k, width).alias("b"),
                    )
                    for k in range(depth)
                ]
            )
        ).alias("kb"),
    ).select(col, "kb.k", "kb.b")
    # LEFT join + coalesce-to-0: the counter table is SPARSE (only
    # touched cells exist), so an inner join silently dropped tokens
    # whose cells were never incremented, and a token with SOME empty
    # cells took its min over only the non-empty ones — inflating the
    # estimate past the true sketch answer of 0 (review r8).
    return (
        q.join(F.broadcast(sketch), ["k", "b"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cms_estimate"))
    )


# ---------------------------------------------------------------------------
# HyperLogLog as a DataFrame (bucket, max-rank register table). Same
# engine-parity trick as the CMS: the hash is a 32-bit md5 slice and
# the register rank comes from the length of the minimal binary string
# (bin()), both of which DuckDB reproduces exactly — so even the
# ESTIMATE is hash-checkable. At production scale swap the hash for
# xxhash64 and the estimate for approx_count_distinct (Spark's native
# HLL++); this implementation exists to pin the algorithm end-to-end.
# ---------------------------------------------------------------------------
HLL_B = 10                      # 2^10 = 1024 registers
HLL_M = 1 << HLL_B
_HLL_WBITS = 32 - HLL_B         # remainder bits per hash
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def hll_registers(df: DataFrame, col: str) -> DataFrame:
    """(bucket, r): per-bucket max rank — the HLL register table.

    Partial-agg groupBy: each partition reduces to ≤ m cells before the
    (kilobyte) shuffle. Merging shards = unionByName + re-max.
    """
    v = F.conv(F.substring(F.md5(F.col(col)), 1, 8), 16, 10).cast("long")
    bucket = F.shiftright(v, _HLL_WBITS)
    w = v.bitwiseAND(F.lit((1 << _HLL_WBITS) - 1))
    rank = F.when(w == 0, F.lit(_HLL_WBITS + 1)).otherwise(
        F.lit(_HLL_WBITS + 1) - F.length(F.bin(w))
    )
    # NULL values hash to a (NULL bucket, NULL rank) register row that
    # hll_estimate's count('*') would count into nz, skewing both the
    # raw estimator and linear counting (review r8); SQL COUNT DISTINCT
    # ignores NULLs, so the sketch does too.
    return (
        df.filter(F.col(col).isNotNull())
        .select(bucket.alias("bucket"), rank.alias("rank"))
        .groupBy("bucket")
        .agg(F.max("rank").alias("r"))
    )


def hll_merge(*registers: DataFrame) -> DataFrame:
    """Union register tables and re-max — the HLL merge."""
    out = registers[0]
    for s in registers[1:]:
        out = out.unionByName(s)
    return out.groupBy("bucket").agg(F.max("r").alias("r"))


def hll_estimate(registers: DataFrame) -> DataFrame:
    """One-row (hll_estimate) from a register table: the standard
    alpha·m²/Σ2^-M_j estimator with the small-range linear-counting
    correction. Pure deterministic arithmetic — rounds to 3 dp for
    float-association safety across engines."""
    m = float(HLL_M)
    agg = registers.agg(
        # coalesce: an EMPTY register table (no rows seen) must
        # estimate 0 via linear counting, not return NULL (review r8)
        F.coalesce(
            F.sum(F.pow(F.lit(2.0), -F.col("r"))), F.lit(0.0)
        ).alias("s"),
        F.count("*").alias("nz"),
    )
    zeros = F.lit(m) - F.col("nz")
    raw = F.lit(_HLL_ALPHA) * F.lit(m) * F.lit(m) / (F.col("s") + zeros)
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0), F.lit(m) * F.log(F.lit(m) / zeros)
    ).otherwise(raw)
    return agg.select(F.round(est, 3).alias("hll_estimate"))


# ---------------------------------------------------------------------------
# Bloom filter as a DataFrame (a distinct set of bit positions). The
# production use is the semi-join pre-filter: build over a small key set
# (an eval suite's shingles, a blocklist), broadcast the position table,
# and drop the non-matching bulk of a 100 TB scan before any exact join.
# Same md5-slice hashes as the CMS — engine-reproducible, so probe
# counts (including false positives) are hash-checkable.
# ---------------------------------------------------------------------------
BLOOM_K = 4
BLOOM_BITS = 1 << 16


def _bloom_positions(col: str, k: int, bits: int) -> Column:
    return F.explode(
        F.array(*[cms_bucket(F.col(col), i, bits) for i in range(k)])
    )


def bloom_build(
    keys: DataFrame, col: str, k: int = BLOOM_K, bits: int = BLOOM_BITS
) -> DataFrame:
    """(pos): the set of bits the key set lights up — ≤ k·|keys| rows,
    distinct'd (partial-agg friendly)."""
    return keys.select(_bloom_positions(col, k, bits).alias("pos")).distinct()


def bloom_probe(
    bloom: DataFrame,
    queries: DataFrame,
    col: str,
    k: int = BLOOM_K,
    bits: int = BLOOM_BITS,
) -> DataFrame:
    """queries + ``maybe`` flag: true iff ALL k probe bits are set.
    The bit table broadcasts; per query the join matches ≤ k rows and
    the groupBy counts them — no row explosion survives the aggregate.

    The probe side is distinct'd on ``col`` internally: duplicate query
    values would otherwise multiply the per-value hit count (nhit =
    k·dups ≠ k), turning a genuinely present key into ``maybe=false`` —
    a silent false negative, violating the Bloom invariant."""
    probes = (
        queries.select(col)
        .dropDuplicates([col])
        .select(F.col(col), _bloom_positions(col, k, bits).alias("pos"))
    )
    hits = (
        probes.join(F.broadcast(bloom), "pos")
        .groupBy(col)
        .agg(F.count("*").alias("nhit"))
    )
    return (
        queries.join(hits, col, "left")
        .withColumn("maybe", F.coalesce(F.col("nhit"), F.lit(0)) == k)
        .drop("nhit")
    )


# ---------------------------------------------------------------------------
# KMV (bottom-k by hash) sketch: a fixed-size, MERGEABLE uniform sample
# — the quantile/distinct companion to the CMS/HLL/Bloom set. The
# sketch is the k rows whose md5(key) sort lowest: deterministic,
# engine-reproducible (same md5-hex trick as the CMS), and mergeable
# exactly — bottom-k of a union == bottom-k of the unioned bottom-ks,
# so shard sketches combine by union + re-limit. Construction is
# TakeOrderedAndProject: per-partition heaps of k rows, driver merge —
# no shuffle of the corpus, O(k) state anywhere.
# ---------------------------------------------------------------------------
KMV_K = 500


def kmv_sample(
    df: DataFrame, value_col: str, key_col: str, k: int = KMV_K
) -> DataFrame:
    """(v, h): the k rows with the smallest md5(key) — a deterministic
    uniform sample (md5 is uniform over distinct keys)."""
    return (
        df.select(
            F.col(value_col).alias("v"),
            F.md5(F.col(key_col).cast("string")).alias("h"),
        )
        .orderBy("h")
        .limit(k)
    )


def kmv_quantiles(
    sample: DataFrame, qs: list[float], k: int = KMV_K
) -> DataFrame:
    """(q, value) estimated quantiles from a KMV sample: rank the k
    sample rows by value (h as the unique tiebreaker) and index-select
    row 1 + floor(q·(k-1)) — no interpolation, so both engines pick the
    identical element. The Window here runs over the k-row sketch, not
    the corpus (model-sized by construction; allow-listed in the plan
    lint)."""
    from pyspark.sql.window import Window

    spark = sample.sparkSession
    # Index against the ACTUAL sample size, not the nominal k: a corpus
    # with fewer than k rows yields a short sample, and ranks computed
    # from k would point past it — the inner join then silently dropped
    # those quantiles from the output (review r8). The count runs on
    # the checkpointed model-sized sketch (also saving the later join
    # a re-execution of the TakeOrdered).
    sample = sample.localCheckpoint()
    n_eff = max(1, min(k, sample.count()))  # 1: empty sample joins to
    # nothing below, yielding an empty result with the caller's v type
    idx = [(float(q), 1 + int(q * (n_eff - 1))) for q in qs]
    from csv2parquet_spark.queries.helpers import local_result_df

    picks = F.broadcast(local_result_df(spark, idx, "q double, rn int"))
    ranked = sample.withColumn(
        "rn", F.row_number().over(Window.orderBy("v", "h"))
    )
    return (
        ranked.join(picks, "rn")
        .select("q", F.col("v").alias("value"))
        .orderBy("q")
    )


def mg_partials(tokens: DataFrame, col: str = "token", k: int = 64) -> DataFrame:
    """Misra-Gries heavy-hitter summaries, one per partition:
    ``(tok, est, dec)`` where ``est`` is the surviving counter and
    ``dec`` the partition's total decrement mass (repeated on each of
    its rows for merge-side recovery).

    Memory contract: the PERSISTENT per-partition state is ≤ k counters
    (pruned after every batch merge), but the TRANSIENT state while a
    batch merges is k + that batch's distinct count — bounded by the
    Arrow batch size (``spark.sql.execution.arrow.maxRecordsPerBatch``,
    default 10k rows), not by k. Each Arrow batch is first reduced with
    a vectorized value_counts, then merged into the counter set with
    the summary-merge rule (add counts; if over k, subtract the
    (k+1)-th largest and drop non-positives — Agarwal et al. 2012,
    mergeable summaries). Pruning inside the value_counts loop would
    keep transients at k but do per-token Python work; the batch-sized
    transient is the better trade and is already executor-bounded.
    Deterministic for a fixed input layout; the estimate guarantee
    ``est <= true <= est + total_dec`` holds regardless of merge order.
    """
    import pandas as pd
    from pyspark import TaskContext

    out_schema = "tok string, est long, dec long, pid int"

    def summarize(batches):
        counters: dict[str, int] = {}
        dec = 0
        for pdf in batches:
            for tok, cnt in pdf[col].value_counts().items():
                counters[tok] = counters.get(tok, 0) + int(cnt)
            if len(counters) > k:
                cut = sorted(counters.values(), reverse=True)[k]
                dec += cut
                counters = {
                    t: c - cut for t, c in counters.items() if c - cut > 0
                }
        # sentinel row (tok=None) so the partition's decrement mass
        # survives even if every counter died in the final prune; the
        # pid is EMBEDDED here (not derived at merge time) so the merge
        # stays correct if the partials are repartitioned or cached
        pid = TaskContext.get().partitionId()
        yield pd.DataFrame(
            {
                "tok": list(counters) + [None],
                "est": list(counters.values()) + [0],
                "dec": [dec] * (len(counters) + 1),
                "pid": [pid] * (len(counters) + 1),
            }
        )

    return tokens.select(F.col(col).alias(col)).mapInPandas(
        summarize, out_schema
    )


def mg_merge(partials: DataFrame) -> DataFrame:
    """Merge per-partition MG summaries into one global summary with
    error bounds: ``est`` (lower bound) and ``ub = est + total_dec``
    (upper bound on the true count). The merge is a narrow-key groupBy
    over ≤ k·P rows — kilobytes at any corpus size. Uses the pid column
    ``mg_partials`` embedded, so the partials frame may be cached or
    repartitioned freely; summaries of DISTINCT datasets must not be
    unioned into one merge (their pids would collide)."""
    total_dec = (
        partials.groupBy("pid")
        .agg(F.max("dec").alias("d"))
        .agg(F.sum("d").alias("total_dec"))
    )
    merged = (
        partials.filter(F.col("tok").isNotNull())
        .groupBy("tok")
        .agg(F.sum("est").alias("est"))
    )
    return merged.crossJoin(F.broadcast(total_dec)).select(
        "tok", "est", (F.col("est") + F.col("total_dec")).alias("ub")
    )
