"""Count-Min sketch query with a full DuckDB oracle twin
(operators/sketches.py): build the counter table from the documents
token stream, estimate counts for the exact top-20 tokens, and report
estimate vs truth. The oracle reproduces the md5-slice hash functions
bit-for-bit, so this sketch — normally an "approximate, rows-only"
structure — is hash-CHECKED end to end (the estimates are deterministic
even though they are approximate)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from csv2parquet_spark.operators.sketches import CMS_DEPTH, CMS_WIDTH
from csv2parquet_spark.queries.registry import register
from csv2parquet_spark.tables import table

_TOP = 20


def _cms_oracle(depth: int = CMS_DEPTH, width: int = CMS_WIDTH, top: int = _TOP) -> str:
    bucket = (
        "CAST(('0x' || substr(md5(t), 1 + 8 * r.k, 8)) AS BIGINT) % " + str(width)
    )
    return f"""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS t FROM documents
    ), sk AS (
      SELECT r.k AS k, {bucket} AS b, count(*) AS c
      FROM tok, (SELECT unnest(range(0, {depth})) AS k) r
      GROUP BY 1, 2
    ), cnt AS (
      SELECT t, count(*) AS c FROM tok GROUP BY t
    ), top AS (
      SELECT t, c FROM cnt ORDER BY c DESC, t LIMIT {top}
    )
    SELECT top.t AS token, CAST(top.c AS BIGINT) AS exact_count,
           CAST(min(sk.c) AS BIGINT) AS cms_estimate
    FROM top, (SELECT unnest(range(0, {depth})) AS k) r
    JOIN sk ON sk.k = r.k AND sk.b = {bucket}
    GROUP BY 1, 2
    """


@register("count_min_token_counts", oracle=_cms_oracle())
def count_min_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min estimates vs exact counts for the corpus's top-20
    tokens. Sketch construction shuffles ≤ depth·width counter cells
    (partial agg collapses each partition map-side); the lookup
    broadcasts the 4096-cell sketch. cms_estimate ≥ exact_count always
    (CMS never undercounts) — the oracle pins both numbers."""
    from csv2parquet_spark.operators.scan import parallelize_scan
    from csv2parquet_spark.operators.sketches import cms_build, cms_lookup

    # gated rebalance + one materialization (r11): the token explode
    # feeds BOTH the sketch build and the exact-count arm, each of
    # which re-ran the single-file single-task scan; no-op at scale
    docs = parallelize_scan(
        table(spark, sf_dir, "documents").select("text")
    ).localCheckpoint()
    tok = docs.select(F.explode(F.split("text", " ")).alias("token"))
    sketch = cms_build(tok)
    cnt = tok.groupBy("token").agg(F.count("*").alias("exact_count"))
    top = cnt.orderBy(F.desc("exact_count"), "token").limit(_TOP)
    est = cms_lookup(sketch, top.select("token"))
    return top.join(est, "token").select("token", "exact_count", "cms_estimate")


def _hll_oracle() -> str:
    from csv2parquet_spark.operators.sketches import _HLL_ALPHA, _HLL_WBITS, HLL_M

    mask = (1 << _HLL_WBITS) - 1
    rmax = _HLL_WBITS + 1
    # explicit DOUBLE casts: DuckDB parses bare float literals as
    # DECIMAL and overflows multiplying alpha * m * m
    m = f"CAST({float(HLL_M)!r} AS DOUBLE)"
    alpha = f"CAST({_HLL_ALPHA!r} AS DOUBLE)"
    return f"""
    WITH h AS (
      SELECT CAST(('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8))
                  AS BIGINT) AS v
      FROM lineitem
    ), reg AS (
      SELECT v >> {_HLL_WBITS} AS bucket,
             max(CASE WHEN (v & {mask}) = 0 THEN {rmax}
                      ELSE {rmax} - length(bin(v & {mask})) END) AS r
      FROM h GROUP BY 1
    ), agg AS (
      SELECT sum(pow(2.0, -r)) AS s, count(*) AS nz FROM reg
    ), est AS (
      SELECT CASE WHEN {alpha} * {m} * {m} / (s + ({m} - nz)) <= 2.5 * {m}
                   AND ({m} - nz) > 0
                  THEN {m} * ln({m} / ({m} - nz))
                  ELSE {alpha} * {m} * {m} / (s + ({m} - nz)) END AS e
      FROM agg
    )
    SELECT (SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) FROM lineitem)
             AS exact_distinct,
           round(e, 3) AS hll_estimate
    FROM est
    """


@register("hll_distinct_parts", oracle=_hll_oracle())
def hll_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hand-rolled HyperLogLog vs exact distinct over l_partkey — and
    because the hash (md5 slice) and register ranks (bin-string length)
    are engine-reproducible, the ESTIMATE itself is hash-checked, not
    just declared. Register build is a partial-agg groupBy to ≤1024
    cells (kilobyte shuffle at any scale); production swaps in
    approx_count_distinct (native HLL++), pinned here algorithmically."""
    from csv2parquet_spark.operators.sketches import hll_estimate, hll_registers

    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").cast("string").alias("pk")
    )
    regs = hll_registers(li, "pk")
    est = hll_estimate(regs)
    exact = table(spark, sf_dir, "lineitem").agg(
        F.count_distinct("l_partkey").alias("exact_distinct")
    )
    return exact.crossJoin(est)


def _bloom_oracle() -> str:
    from csv2parquet_spark.operators.sketches import BLOOM_BITS, BLOOM_K

    pos = (
        "CAST(('0x' || substr(md5(sh), 1 + 8 * r.k, 8)) AS BIGINT) % "
        + str(BLOOM_BITS)
    )
    ks = f"(SELECT unnest(range(0, {BLOOM_K})) AS k) r"
    return f"""
    WITH toks AS (
      SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, source,
             t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
               || ' ' || t[i+4] AS sh
      FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 3)) AS i)
    ), ev AS (
      SELECT DISTINCT sh FROM sh WHERE source IN ('src0', 'src1')
    ), bits AS (
      SELECT DISTINCT {pos} AS pos FROM ev, {ks}
    ), tr AS (
      SELECT DISTINCT sh FROM sh WHERE source NOT IN ('src0', 'src1')
    ), probe AS (
      SELECT tr.sh, count(*) AS nhit
      FROM tr, {ks} JOIN bits ON bits.pos = {pos}
      GROUP BY tr.sh
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM tr) AS n_probes,
           (SELECT CAST(count(*) AS BIGINT) FROM probe
             WHERE nhit = {BLOOM_K}) AS n_maybe,
           (SELECT CAST(count(*) AS BIGINT) FROM tr JOIN ev USING (sh))
             AS n_true_hits
    """


@register("bloom_decontam_prefilter", oracle=_bloom_oracle())
def bloom_decontam_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter as a decontamination pre-filter: light up the bits
    of the eval suite's 5-token shingles, probe every distinct train
    shingle, and report probes / maybe-hits / true hits (maybe ≥ true;
    the gap is the false-positive cost). At 100 TB the broadcast bit
    table drops the non-matching bulk of the corpus before any exact
    join — the classic semi-join pre-filter. Counts are deterministic,
    so even the FP behavior is hash-checked."""
    from csv2parquet_spark.operators import text as TX
    from csv2parquet_spark.operators.sketches import bloom_build, bloom_probe

    docs = table(spark, sf_dir, "documents")
    sh = docs.select(
        "source",
        F.explode(
            F.array_distinct(TX.shingles(TX.tokens("text"), k=5))
        ).alias("sh"),
    ).distinct()
    ev = sh.filter(F.col("source").isin("src0", "src1")).select("sh").distinct()
    tr = sh.filter(~F.col("source").isin("src0", "src1")).select("sh").distinct()
    bloom = bloom_build(ev, "sh")
    probed = bloom_probe(bloom, tr, "sh")
    n_true = tr.join(ev, "sh").count()
    return probed.agg(
        F.count("*").alias("n_probes"),
        F.sum(F.when(F.col("maybe"), 1).otherwise(0)).alias("n_maybe"),
        F.lit(n_true).cast("long").alias("n_true_hits"),
    )


_KMV_K = 500
_KMV_QS = [0.25, 0.5, 0.75, 0.95]
# Literal rank indexes shared by both engines — computed ONCE in Python
# so neither engine's floor(q*(k-1)) float behavior is in the loop.
_KMV_IDX = [(q, 1 + int(q * (_KMV_K - 1))) for q in _KMV_QS]


def _kmv_oracle() -> str:
    picks = ", ".join(f"({q!r}, {rn})" for q, rn in _KMV_IDX)
    return f"""
    WITH s AS (
      -- quantile functions are defined over NON-NULL values (the
      -- approx_percentile convention): sample the known-value
      -- population, or the engines' opposite NULL sort orders shift
      -- every rank pick (NULL-twin contract r11)
      SELECT o_totalprice AS v, md5(CAST(o_orderkey AS VARCHAR)) AS h
      FROM orders WHERE o_totalprice IS NOT NULL ORDER BY h LIMIT {_KMV_K}
    ), r AS (
      SELECT v, h, row_number() OVER (ORDER BY v, h) AS rn FROM s
    )
    SELECT CAST(t.q AS DOUBLE) AS q, r.v AS value
    FROM (VALUES {picks}) AS t(q, rn)
    JOIN r ON r.rn = t.rn
    ORDER BY q
    """


@register("kmv_quantile_sketch", oracle=_kmv_oracle())
def kmv_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimation from a KMV (bottom-k by md5) sketch: the
    fixed-size mergeable uniform sample the CMS/HLL/Bloom family was
    missing. Construction is TakeOrderedAndProject (per-partition
    k-heaps + driver merge — no corpus shuffle, O(k) state); shard
    sketches merge by union + re-limit (exactly, not approximately —
    pinned by test_kmv_merge_is_exact). The index-select quantile (no
    interpolation) makes both engines pick the identical sample
    element, so even the ESTIMATES hash-match."""
    from csv2parquet_spark.operators.sketches import kmv_quantiles, kmv_sample

    # NULL values carry no quantile information (see oracle note)
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice").isNotNull())
    return kmv_quantiles(
        kmv_sample(o, "o_totalprice", "o_orderkey", _KMV_K), _KMV_QS, _KMV_K
    )


@register(
    "heavy_hitters_mg",
    oracle="""
    WITH t AS MATERIALIZED (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ), g AS MATERIALIZED (
      SELECT token, count(*) AS cnt FROM t WHERE token <> '' GROUP BY token
    ), n AS (
      SELECT sum(cnt) AS n FROM g
    )
    SELECT token AS tok, cnt
    FROM g, n
    WHERE cnt * 65 > n
    ORDER BY cnt DESC, tok
    LIMIT 20
    """,
)
def heavy_hitters_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries heavy hitters with EXACT verification — the
    production sketch-then-verify pattern: pass 1 builds per-partition
    MG(k=64) summaries and merges them (operators/sketches.py
    mg_partials/mg_merge — mergeable summaries, Agarwal et al. 2012;
    any token with true count > N/(k+1) is GUARANTEED to survive the
    merge, pinned by tests/test_operators.py); pass 2 exact-counts ONLY
    the ≤k surviving candidates (broadcast semi-mark, then a grouped
    count whose key space is ≤ k+1 — candidate token or NULL — so the
    shuffle carries ≤65 partial rows per partition and the NULL group's
    count doubles as the stream length N, no third scan). The output —
    tokens whose EXACT count clears the N/(k+1) bar, top-20 — is
    layout-independent (the sketch only prunes; integer ``cnt*65 > N``
    avoids float thresholds), which is what upgrades this query from
    the rows-only check to a full hash match."""
    from csv2parquet_spark.operators.sketches import mg_merge, mg_partials

    d = table(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("token")).filter(
        F.col("token") != ""
    )
    summary = mg_merge(mg_partials(toks, "token", k=64))
    cands = summary.filter(F.col("tok").isNotNull()).select("tok")
    marked = toks.join(
        F.broadcast(
            cands.select(F.col("tok").alias("token"), F.lit(1).alias("is_cand"))
        ),
        "token",
        "left",
    )
    counted = (
        marked.groupBy(
            F.when(F.col("is_cand") == 1, F.col("token")).alias("c")
        )
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint()  # ≤ k+1 rows; N derives from it, no rescan
    )
    total = counted.agg(F.sum("cnt").alias("n"))
    return (
        counted.filter(F.col("c").isNotNull())
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * 65 > F.col("n"))
        .select(F.col("c").alias("tok"), "cnt")
        .orderBy(F.desc("cnt"), "tok")
        .limit(20)
    )


def _hll_intersection_oracle() -> str:
    from csv2parquet_spark.operators.sketches import _HLL_ALPHA, _HLL_WBITS, HLL_M

    mask = (1 << _HLL_WBITS) - 1
    rmax = _HLL_WBITS + 1
    m = f"CAST({float(HLL_M)!r} AS DOUBLE)"
    alpha = f"CAST({_HLL_ALPHA!r} AS DOUBLE)"

    def regs(name: str, year: str | None) -> str:
        src = (
            f"SELECT CAST(('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8))"
            f" AS BIGINT) AS v FROM lineitem"
            + (f" WHERE year(l_shipdate) = {year}" if year else
               " WHERE year(l_shipdate) IN (1996, 1997)")
        )
        return f"""{name} AS MATERIALIZED (
      SELECT v >> {_HLL_WBITS} AS bucket,
             max(CASE WHEN (v & {mask}) = 0 THEN {rmax}
                      ELSE {rmax} - length(bin(v & {mask})) END) AS r
      FROM ({src}) GROUP BY 1
    )"""

    def est(name: str, reg: str) -> str:
        return f"""{name} AS (
      SELECT round(CASE WHEN {alpha} * {m} * {m} / (s + ({m} - nz)) <= 2.5 * {m}
                         AND ({m} - nz) > 0
                        THEN {m} * ln({m} / ({m} - nz))
                        ELSE {alpha} * {m} * {m} / (s + ({m} - nz)) END, 3) AS e
      FROM (SELECT sum(pow(2.0, -r)) AS s, count(*) AS nz FROM {reg})
    )"""

    return f"""
    WITH {regs('ra', '1996')}, {regs('rb', '1997')}, {regs('ru', None)},
    {est('ea', 'ra')}, {est('eb', 'rb')}, {est('eu', 'ru')}
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM (
              SELECT l_partkey FROM lineitem WHERE year(l_shipdate) = 1996
              INTERSECT
              SELECT l_partkey FROM lineitem WHERE year(l_shipdate) = 1997))
             AS exact_intersection,
           (SELECT e FROM ea) AS hll_a,
           (SELECT e FROM eb) AS hll_b,
           (SELECT e FROM eu) AS hll_union,
           round((SELECT e FROM ea) + (SELECT e FROM eb)
                 - (SELECT e FROM eu), 3) AS hll_intersection
    """


@register("hll_intersection_estimate", oracle=_hll_intersection_oracle())
def hll_intersection_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-INTERSECTION cardinality from HLL sketches by
    inclusion-exclusion: parts shipped in 1996 ∩ 1997 estimated as
    |A| + |B| - |A ∪ B|, where the union sketch is the register-wise
    max merge — the op HLLs support exactly (intersection has no
    native sketch; I-E over the mergeable union is the standard
    derivation, with error growing as the Jaccard shrinks).

    Each register build is a partial-agg groupBy to <= m cells; the
    merge is union + re-max; everything downstream is model-sized
    arithmetic. The estimates and the derived intersection are
    hash-checked against DuckDB (same md5-slice hashes), alongside the
    exact intersection for the error to be read off.
    """
    from csv2parquet_spark.operators.sketches import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", F.year("l_shipdate").alias("yr")
    )
    a = li.filter(F.col("yr") == 1996).select(
        F.col("l_partkey").cast("string").alias("pk")
    )
    b = li.filter(F.col("yr") == 1997).select(
        F.col("l_partkey").cast("string").alias("pk")
    )
    ra, rb = hll_registers(a, "pk"), hll_registers(b, "pk")
    ea = hll_estimate(ra).withColumnRenamed("hll_estimate", "hll_a")
    eb = hll_estimate(rb).withColumnRenamed("hll_estimate", "hll_b")
    eu = hll_estimate(hll_merge(ra, rb)).withColumnRenamed(
        "hll_estimate", "hll_union"
    )
    exact = (
        li.filter(F.col("yr") == 1996)
        .select("l_partkey")
        .intersect(li.filter(F.col("yr") == 1997).select("l_partkey"))
        .agg(F.count("*").alias("exact_intersection"))
    )
    return (
        exact.crossJoin(ea)
        .crossJoin(eb)
        .crossJoin(eu)
        .select(
            "exact_intersection",
            "hll_a",
            "hll_b",
            "hll_union",
            F.round(
                F.col("hll_a") + F.col("hll_b") - F.col("hll_union"), 3
            ).alias("hll_intersection"),
        )
    )
