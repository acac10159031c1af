"""Operational / large-scale-join patterns (engine extension,
SURVEY.md §2.8): the bucketed interval join (turn a large×large theta
join into an equi join + residual filter) and a Merkle-style checksum
table diff (find WHERE two snapshots differ without moving either).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from csv2parquet_spark.queries.helpers import sql_dsum
from csv2parquet_spark.queries.registry import register
from csv2parquet_spark.tables import table


@register(
    "interval_bucket_join",
    oracle="""
    SELECT o.o_orderkey AS iv_id,
           count(*) AS n_items,
           count(DISTINCT l.l_partkey) AS n_parts
    FROM orders o JOIN lineitem l
      ON CAST(l.l_shipdate AS DATE) >= CAST(o.o_orderdate AS DATE)
     AND CAST(l.l_shipdate AS DATE)
         <= CAST(o.o_orderdate AS DATE) + CAST(o.o_orderkey % 20 + 1 AS INTEGER)
    WHERE o.o_orderkey % 997 = 0
    GROUP BY o.o_orderkey
    """,
)
def interval_bucket_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Points-in-interval join via BUCKET EXPANSION: campaign intervals
    (a deterministic slice of orders, 1-20 days each) matched to every
    lineitem shipped inside them.

    The scale pattern Spark lacks natively: a naive interval join is a
    theta join (BroadcastNestedLoop if one side is small, quadratic if
    neither is). Here each interval explodes into the <= 4 week buckets
    it covers, points key on their own week bucket, and the join is a
    plain shuffled EQUI join on the bucket + an exact residual filter —
    both sides stream at corpus scale, skewed weeks split by AQE. Any
    monotone bucketing is correct (a contained point's bucket always
    lies within the interval's bucket range); bucket width trades
    duplication (intervals/width) against candidate precision.
    The oracle is the direct theta join — same rows, different plan.
    """
    o = table(spark, sf_dir, "orders")
    iv = (
        o.filter(F.col("o_orderkey") % 997 == 0)
        .select(
            F.col("o_orderkey").alias("iv_id"),
            F.to_date("o_orderdate").alias("d0"),
            F.date_add(
                F.to_date("o_orderdate"),
                (F.col("o_orderkey") % 20 + 1).cast("int"),
            ).alias("d1"),
        )
    )
    ivb = iv.withColumn(
        "wk",
        F.explode(
            F.sequence(
                F.date_trunc("week", "d0").cast("date"),
                F.date_trunc("week", "d1").cast("date"),
                F.expr("INTERVAL 7 DAYS"),
            )
        ),
    )
    li = table(spark, sf_dir, "lineitem").select(
        F.to_date("l_shipdate").alias("p"),
        "l_partkey",
        F.date_trunc("week", F.to_date("l_shipdate")).cast("date").alias("wk"),
    )
    return (
        li.join(ivb, "wk")
        .filter((F.col("p") >= F.col("d0")) & (F.col("p") <= F.col("d1")))
        .select("iv_id", "p", "l_partkey")
        .groupBy("iv_id")
        .agg(
            F.count("*").alias("n_items"),
            F.countDistinct("l_partkey").alias("n_parts"),
        )
    )


@register(
    "table_diff_digest",
    oracle="""
    WITH a AS (
      -- NULL cells digest as the explicit '<NULL>' marker: an
      -- anti-entropy digest must COVER NULLs (a NULL-vs-'X' cell
      -- difference has to flip the bucket), and bare || would null
      -- the whole row repr out of the sum (NULL-twin contract)
      SELECT CAST(o_orderkey % 64 AS INTEGER) AS bucket,
             CAST(sum(CAST(('0x' || substr(md5(
                   CAST(o_orderkey AS VARCHAR) || '|'
                   || coalesce(o_orderstatus, '<NULL>') || '|'
                   || coalesce(o_orderpriority, '<NULL>')), 1, 8))
                   AS BIGINT)) AS BIGINT) AS digest,
             count(*) AS n
      FROM orders GROUP BY 1
    ),
    b AS (
      SELECT CAST(o_orderkey % 64 AS INTEGER) AS bucket,
             CAST(sum(CAST(('0x' || substr(md5(
                   CAST(o_orderkey AS VARCHAR) || '|' ||
                   coalesce(CASE WHEN o_orderkey % 7771 = 0 THEN 'X'
                                 ELSE o_orderstatus END, '<NULL>')
                   || '|' || coalesce(o_orderpriority, '<NULL>')), 1, 8))
                   AS BIGINT)) AS BIGINT) AS digest,
             count(*) AS n
      FROM orders WHERE o_orderkey % 9973 <> 0 GROUP BY 1
    )
    SELECT a.bucket,
           a.digest AS digest_a, b.digest AS digest_b,
           a.n AS n_a, b.n AS n_b
    FROM a JOIN b ON a.bucket = b.bucket
    WHERE a.digest <> b.digest OR a.n <> b.n
    """,
)
def table_diff_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merkle-style anti-entropy diff: which of 64 key buckets differ
    between two snapshots, comparing ORDER-INDEPENDENT per-bucket
    digests (sum of a 32-bit md5 slice per row — exact integer
    addition, so partial aggregation order is irrelevant) instead of
    rows.

    The second snapshot is a deterministic mutation of orders (one key
    in ~9973 deleted, one in ~7771 modified), so some buckets MUST
    differ. At 100 TB each side reduces map-side to 64 (digest, count)
    cells — the comparison shuffles kilobytes, and only flagged buckets
    ever need row-level reconciliation (recurse with a finer modulus).
    """
    o = table(spark, sf_dir, "orders")

    def digest(df: DataFrame, row_repr) -> DataFrame:
        return df.groupBy(
            (F.col("o_orderkey") % 64).cast("int").alias("bucket")
        ).agg(
            F.sum(
                F.conv(F.substring(F.md5(row_repr), 1, 8), 16, 10).cast("long")
            ).alias("digest"),
            F.count("*").alias("n"),
        )

    # coalesce to the '<NULL>' marker, never bare concat_ws: concat_ws
    # SKIPS null fields (collapsing the field position entirely) where
    # the oracle's || nulls the whole repr — both hide NULL cells from
    # the digest, and a diff tool that can't see NULLs can't repair
    # them (NULL-twin contract r11).
    nn = lambda c: F.coalesce(F.col(c) if isinstance(c, str) else c, F.lit("<NULL>"))  # noqa: E731
    repr_a = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        nn("o_orderstatus"),
        nn("o_orderpriority"),
    )
    repr_b = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        nn(
            F.when(F.col("o_orderkey") % 7771 == 0, "X").otherwise(
                F.col("o_orderstatus")
            )
        ),
        nn("o_orderpriority"),
    )
    a = digest(o, repr_a)
    b = digest(o.filter(F.col("o_orderkey") % 9973 != 0), repr_b)
    return (
        a.alias("a")
        .join(b.alias("b"), "bucket")
        .filter(
            (F.col("a.digest") != F.col("b.digest")) | (F.col("a.n") != F.col("b.n"))
        )
        .select(
            "bucket",
            F.col("a.digest").alias("digest_a"),
            F.col("b.digest").alias("digest_b"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
        )
    )


__all__ = ["interval_bucket_join", "table_diff_digest"]


@register(
    "ols_per_group",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             count(*) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sx,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sy,
             CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
             AS intercept
    FROM m
    """,
)
def ols_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group closed-form OLS (price ~ quantity): slope/intercept
    from the five sufficient moments, each an exact decimal sum.

    The distributed-regression shape: one map-side-combining aggregate
    per group (five partials), then driver-free closed-form algebra in
    the projection — no iteration, no collect. Association order can't
    perturb the result (decimal sums; per-row products are IEEE-exact
    doubles), so the engines agree bit-for-bit before the 6dp round —
    the same discipline the built-in regr_/corr aggregates cannot
    promise under partial aggregation.
    """
    l = table(spark, sf_dir, "lineitem")
    DEC38 = "decimal(38,6)"
    m = l.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_quantity").cast(DEC38)).cast("double").alias("sx"),
        F.sum(F.col("l_extendedprice").cast(DEC38)).cast("double").alias("sy"),
        F.sum((F.col("l_quantity") * F.col("l_quantity")).cast(DEC38))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("l_quantity") * F.col("l_extendedprice")).cast(DEC38))
        .cast("double")
        .alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return m.select(
        "l_returnflag",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
    )


@register(
    "lang_similarity_matrix",
    oracle="""
    WITH counts AS (
      SELECT lang, tok, count(*) AS c
      FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents)
      WHERE tok <> ''
      GROUP BY lang, tok
    ),
    norms AS (
      SELECT lang, sqrt(CAST(sum(c * c) AS DOUBLE)) AS nrm FROM counts GROUP BY lang
    ),
    dots AS (
      SELECT a.lang AS lang_a, b.lang AS lang_b,
             CAST(sum(CAST(a.c * b.c AS DECIMAL(38,6))) AS DOUBLE) AS dot
      FROM counts a JOIN counts b ON a.tok = b.tok AND a.lang < b.lang
      GROUP BY a.lang, b.lang
    )
    SELECT d.lang_a, d.lang_b,
           round(d.dot / (na.nrm * nb.nrm), 6) AS cos_sim
    FROM dots d
    JOIN norms na ON d.lang_a = na.lang
    JOIN norms nb ON d.lang_b = nb.lang
    """,
)
def lang_similarity_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine similarity between per-language token
    distributions — corpus-composition drift detection in one job.

    Token-count vectors never materialize: the dot products come from a
    self-join of the (lang, tok, c) aggregate ON TOK (the join key is
    the shared dimension, pairs generated only where mass overlaps),
    norms are an exact integer sum per language (sqrt is correctly
    rounded IEEE — engine-identical), and the |langs|^2-sized result
    joins against the broadcast norm table. All products are integer-
    exact; the only float ops are the final sqrt/divide, identical on
    both engines before the 6dp round.
    """
    d = table(spark, sf_dir, "documents")
    counts = (
        d.select("lang", F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("lang", "tok")
        .agg(F.count("*").alias("c"))
    )
    norms = counts.groupBy("lang").agg(
        F.sqrt(F.sum(F.col("c") * F.col("c")).cast("double")).alias("nrm")
    )
    a = counts.select(
        F.col("lang").alias("lang_a"), "tok", F.col("c").alias("ca")
    )
    b = counts.select(
        F.col("lang").alias("lang_b"), "tok", F.col("c").alias("cb")
    )
    dots = (
        a.join(b, "tok")
        .filter(F.col("lang_a") < F.col("lang_b"))
        .groupBy("lang_a", "lang_b")
        .agg(
            F.sum((F.col("ca") * F.col("cb")).cast("decimal(38,6)"))
            .cast("double")
            .alias("dot")
        )
    )
    na = norms.select(F.col("lang").alias("lang_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("lang").alias("lang_b"), F.col("nrm").alias("nb"))
    return (
        dots.join(F.broadcast(na), "lang_a")
        .join(F.broadcast(nb), "lang_b")
        .select(
            "lang_a",
            "lang_b",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias(
                "cos_sim"
            ),
        )
    )


@register(
    "scd2_user_tier_history",
    oracle="""
    WITH p AS (
      SELECT user_id, ts, event_id,
             CASE WHEN value < 50 THEN 'low'
                  WHEN value < 150 THEN 'mid'
                  ELSE 'high' END AS tier
      FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
    ), o AS (
      SELECT user_id, ts, event_id, tier,
             CASE WHEN lag(tier) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) IS NULL
                    OR tier <> lag(tier) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id)
                  THEN 1 ELSE 0 END AS chg
      FROM p
    ), v AS (
      SELECT user_id, ts, tier,
             sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS ver
      FROM o
    ), seg AS (
      SELECT user_id, CAST(ver AS BIGINT) AS version, min(tier) AS tier,
             min(ts) AS vfrom
      FROM v GROUP BY user_id, ver
    )
    SELECT user_id, version, tier,
           CAST(floor(epoch(vfrom)) AS BIGINT) AS valid_from_s,
           CAST(floor(epoch(lead(vfrom) OVER (PARTITION BY user_id
                                              ORDER BY version))) AS BIGINT)
             AS valid_to_s,
           lead(vfrom) OVER (PARTITION BY user_id ORDER BY version) IS NULL
             AS is_current
    FROM seg
    """,
)
def scd2_user_tier_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history build (the warehouse dimension-versioning
    pattern): per user, the purchase-value tier over time collapsed
    into validity intervals — consecutive equal tiers merge
    (gaps-and-islands), each segment gets [valid_from, valid_to) epoch
    bounds and an is_current flag; valid_to of the open segment is NULL.

    Scale shape: every window is PARTITION BY user_id — per-key bounded
    state, hash-partitioned across the cluster, no global stage. The
    segment rollup reuses the same (user_id) partitioning, so the whole
    plan is one keyed shuffle + narrow windows; this is exactly how
    MERGE-style SCD2 engines (Delta/Hudi) sequence change capture.
    """
    # NULL contract (r11): a purchase with NULL ts has no place on a
    # validity timeline — excluded on both sides (NULL ts otherwise
    # sorts differently per engine and shifts every change point).
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = (
        table(spark, sf_dir, "events")
        .filter((F.col("event_type") == "purchase") & F.col("ts").isNotNull())
        .select(
            "user_id",
            "ts",
            "event_id",
            F.when(F.col("value") < 50, "low")
            .when(F.col("value") < 150, "mid")
            .otherwise("high")
            .alias("tier"),
        )
    )
    prev = F.lag("tier").over(w)
    o = p.withColumn(
        "chg",
        F.when(prev.isNull() | (F.col("tier") != prev), F.lit(1)).otherwise(
            F.lit(0)
        ),
    )
    v = o.withColumn(
        "ver",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    seg = v.groupBy("user_id", F.col("ver").alias("version")).agg(
        F.min("tier").alias("tier"), F.min("ts").alias("vfrom")
    )
    wv = Window.partitionBy("user_id").orderBy("version")
    nxt = F.lead("vfrom").over(wv)
    return seg.select(
        "user_id",
        "version",
        "tier",
        F.col("vfrom").cast("long").alias("valid_from_s"),
        nxt.cast("long").alias("valid_to_s"),
        nxt.isNull().alias("is_current"),
    )


@register(
    "skew_join_salted",
    oracle=f"""
    SELECT o.o_orderpriority AS priority,
           count(*) AS n_lines,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')}
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def skew_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-dimension revenue rollup through the HOT-KEY salted join
    (operators/skewjoin.py salted_join_hot): one partial-aggregated
    detection pass finds orderkeys with > 1000 lineitem rows; only
    those take the (key, salt)-joined path (8 sub-keys each, orders
    replicated 8-fold for hot keys only), the rest join plain, and the
    halves union — the skew remedy for heavy hitters that AQE cannot
    split below partition granularity, without the blanket replication
    tax. The salt never reaches the output, so the oracle is the plain
    equi join; tests/test_skew.py pins both the splitting bound and
    hot/cold result identity on a 30%-hot-key fixture, and
    tests/test_plans.py pins that the physical plan carries the salted
    branch.
    """
    from csv2parquet_spark.operators.skewjoin import salted_join_hot
    from csv2parquet_spark.queries.helpers import dsum

    # NO scan rebalance here (r11 measured negative, ~1.7x slower):
    # the added exchange feeds BOTH the hot-key detection pass and the
    # two join branches, so the round-robin shuffle is re-executed per
    # consumer instead of amortized.
    l = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    j = salted_join_hot(
        l.withColumnRenamed("l_orderkey", "o_orderkey"), o, "o_orderkey",
        r=8, hot_threshold=1000,
    )
    return j.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count("*").alias("n_lines"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
    )


@register(
    "dq_constraint_report",
    oracle="""
    SELECT 'lineitem_orderkey_fk' AS constraint,
           (SELECT count(*) FROM lineitem) AS n_checked,
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
             AS n_violations
    UNION ALL
    SELECT 'orders_custkey_fk',
           (SELECT count(*) FROM orders),
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'documents_docid_unique',
           (SELECT count(*) FROM documents),
           (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) FROM (
              SELECT count(*) AS n FROM documents GROUP BY doc_id
              HAVING count(*) > 1))
    UNION ALL
    SELECT 'documents_nchars_consistent',
           (SELECT count(*) FROM documents),
           (SELECT count(*) FROM documents WHERE n_chars <> length(text))
    UNION ALL
    SELECT 'events_value_nonnegative',
           (SELECT count(*) FROM events),
           (SELECT count(*) FROM events WHERE value < 0)
    UNION ALL
    SELECT 'lineitem_quantity_positive',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem
            WHERE l_quantity <= 0 OR l_quantity IS NULL)
    """,
)
def dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality audit (the dbt-test / Deequ shape):
    referential integrity, key uniqueness, derived-column consistency,
    and domain checks, each reported as (constraint, n_checked,
    n_violations).

    Scale shape per check class: FK checks are LEFT-ANTI joins (the
    scalable formulation — never a correlated per-row probe; dimension
    sides broadcast when small, fact sides shuffle once on the key);
    uniqueness is a partial-aggregated groupBy on the key; consistency
    and domain checks are map-side expression counts folded into ONE
    scan per table via conditional aggregation. The six result rows
    union driver-side literals of per-check aggregates — each aggregate
    is model-sized (a single count).
    """
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    d = table(spark, sf_dir, "documents")
    e = table(spark, sf_dir, "events")

    def row(name: str, checked: DataFrame, violations: DataFrame) -> DataFrame:
        n = checked.agg(F.count("*").alias("n_checked"))
        v = violations.agg(F.count("*").cast("long").alias("n_violations"))
        return n.crossJoin(v).select(
            F.lit(name).alias("constraint"), "n_checked", "n_violations"
        )

    fk_l = l.join(o, l["l_orderkey"] == o["o_orderkey"], "left_anti")
    fk_o = o.join(c, o["o_custkey"] == c["c_custkey"], "left_anti")
    dup_docs = (
        d.groupBy("doc_id")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .select(F.explode(F.sequence(F.lit(1), F.col("n"))).alias("x"))
    )
    nchars_bad = d.filter(F.col("n_chars") != F.length("text"))
    val_bad = e.filter(F.col("value") < 0)
    qty_bad = l.filter(
        (F.col("l_quantity") <= 0) | F.col("l_quantity").isNull()
    )
    parts = [
        row("lineitem_orderkey_fk", l, fk_l),
        row("orders_custkey_fk", o, fk_o),
        row("documents_docid_unique", d, dup_docs),
        row("documents_nchars_consistent", d, nchars_bad),
        row("events_value_nonnegative", e, val_bad),
        row("lineitem_quantity_positive", l, qty_bad),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@register(
    "ivm_incremental_agg",
    oracle="""
    SELECT o_orderpriority AS priority,
           count(*) AS n,
           CAST(sum(CAST(CASE WHEN o_orderkey % 7771 = 0
                              THEN o_totalprice * 2
                              ELSE o_totalprice END
                         AS DECIMAL(18, 6))) AS DOUBLE) AS total
    FROM orders
    WHERE o_orderkey % 9973 <> 0
    GROUP BY o_orderpriority
    """,
)
def ivm_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: a per-priority (count, total)
    aggregate over the orders snapshot is MAINTAINED under a change
    batch — deletions (every key % 9973 == 0) and updates (every key %
    7771 == 0 doubles its price) — by merging the OLD aggregate with a
    multiplicity-signed delta aggregate (-1 old row, +1 new row), never
    rescanning the base.

    The oracle recomputes the same result FROM SCRATCH on the mutated
    snapshot, so the hash match proves maintenance == recomputation —
    the distributive-aggregate IVM property warehouses rely on. Scale
    shape: the base aggregate and the delta aggregate are both
    partial-aggregated groupBys (delta cost ∝ |changes|, not |base|);
    the merge is a model-sized full-outer join on the group key, with
    decimal totals kept decimal until the final projection so the
    merge addition is exact. Groups whose maintained count reaches 0
    are dropped (the deletion-collapse case).
    """
    dec = "decimal(18,6)"
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    agg_a = o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count("*").alias("n"), F.sum(F.col("o_totalprice").cast(dec)).alias("t")
    )
    deleted = o.filter(F.col("o_orderkey") % 9973 == 0)
    updated = o.filter(
        (F.col("o_orderkey") % 7771 == 0) & (F.col("o_orderkey") % 9973 != 0)
    )
    delta = (
        deleted.select(
            "o_orderpriority", F.lit(-1).alias("m"), F.col("o_totalprice").alias("v")
        )
        .unionByName(
            updated.select(
                "o_orderpriority", F.lit(-1).alias("m"),
                F.col("o_totalprice").alias("v"),
            )
        )
        .unionByName(
            updated.select(
                "o_orderpriority", F.lit(1).alias("m"),
                (F.col("o_totalprice") * 2).alias("v"),
            )
        )
    )
    agg_d = delta.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.sum("m").alias("dn"), F.sum((F.col("m") * F.col("v")).cast(dec)).alias("dt")
    )
    merged = agg_a.join(agg_d, "priority", "full_outer").select(
        "priority",
        (F.coalesce("n", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias("n"),
        (
            F.coalesce(F.col("t"), F.lit(0).cast(dec))
            + F.coalesce(F.col("dt"), F.lit(0).cast(dec))
        ).alias("t"),
    )
    return merged.filter(F.col("n") > 0).select(
        "priority", "n", F.col("t").cast("double").alias("total")
    )


@register(
    "pareto_abc_parts",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))
                      * 10000) AS BIGINT) AS cents4
      FROM lineitem GROUP BY l_partkey
    ), c AS (
      SELECT l_partkey, cents4,
             sum(cents4) OVER (ORDER BY cents4 DESC, l_partkey
                               ROWS UNBOUNDED PRECEDING) AS cum,
             (SELECT sum(cents4) FROM rev) AS tot
      FROM rev
    ), cls AS (
      SELECT CASE WHEN cum <= tot * 0.8 THEN 'A'
                  WHEN cum <= tot * 0.95 THEN 'B'
                  ELSE 'C' END AS abc_class,
             cents4
      FROM c
    )
    SELECT abc_class, count(*) AS n_parts,
           round(CAST(sum(cents4) AS DOUBLE)
                 / (SELECT CAST(sum(cents4) AS DOUBLE) FROM rev), 6)
             AS revenue_share
    FROM cls GROUP BY abc_class
    """,
)
def pareto_abc_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC inventory classification: parts ranked by revenue,
    class A = the head covering 80% of cumulative revenue, B to 95%,
    C the tail — the classic skewed-dimension analysis.

    The cumulative share is the scalability crux (a naive
    ``sum OVER (ORDER BY revenue DESC)`` is a single-partition sort),
    so this is the second production use of the two-pass
    ``global_cumsum`` (operators/ranking.py), ordered by
    (-revenue, part): range-partitioned parallel sort, broadcast
    offsets, map-only accumulation. Revenue is exact integer
    ten-thousandths-of-a-cent (2dp price × 2dp discount factor —
    decimal-exact, then integral for the cumsum kernel), so both
    engines classify identically with no float boundary.
    """
    from csv2parquet_spark.operators.ranking import global_cumsum

    l = table(spark, sf_dir, "lineitem")
    rev = l.groupBy("l_partkey").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (1 - F.col("l_discount").cast("decimal(18,2)"))
            * 10000
        )
        .cast("long")
        .alias("cents4")
    )
    # grand total from the cumsum's own pass-1 sums (r11): the
    # max("cum") aggregate + crossJoin(broadcast) cost an extra job and
    # a broadcast exchange for one integer. Identical by construction:
    # sum of the per-partition sums == max of the inclusive cumsum.
    c, _tot = global_cumsum(
        rev.withColumn("neg", -F.col("cents4")),
        ["neg", "l_partkey"],
        "cents4",
        cum_col="cum",
        return_totals=True,
    )
    tot = _tot["cents4"]
    cls = c.select(
        F.when(F.col("cum") <= F.lit(tot) * 0.8, "A")
        .when(F.col("cum") <= F.lit(tot) * 0.95, "B")
        .otherwise("C")
        .alias("abc_class"),
        "cents4",
    )
    return cls.groupBy("abc_class").agg(
        F.count("*").alias("n_parts"),
        F.round(
            F.sum("cents4").cast("double") / F.lit(tot).cast("double"), 6
        ).alias("revenue_share"),
    )


@register(
    "join_key_skew_report",
    oracle="""
    WITH g AS (
      SELECT l_orderkey, count(*) AS n FROM lineitem GROUP BY l_orderkey
    )
    SELECT count(*) AS n_keys,
           CAST(max(n) AS BIGINT) AS max_rows,
           CAST(sum(n) AS BIGINT) AS total_rows,
           round(CAST(sum(n) AS DOUBLE) / count(*), 6) AS mean_rows,
           CAST(floor(quantile_cont(n, 0.5)) AS BIGINT) AS p50,
           CAST(floor(quantile_cont(n, 0.99)) AS BIGINT) AS p99,
           round(CAST(max(n) AS DOUBLE) * count(*)
                 / CAST(sum(n) AS DOUBLE), 6) AS skew_factor
    FROM g
    """,
)
def join_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics for lineitem.l_orderkey — the
    detection pass you run BEFORE choosing between a plain join, AQE
    skew splitting, and ``salted_join_hot``: key cardinality, max and
    mean rows per key, p50/p99 of the group-size distribution, and the
    skew factor (max / mean; ~1 = uniform, large = a hot key).

    One partial-aggregated count per key (narrow shuffle), then a
    summary over the per-key counts. Honest caveat: the EXACT
    percentile gathers the per-key counts into one aggregation buffer
    (array-probed once for both quantiles) — n_keys-proportional, not
    model-sized; at 100 TB swap in approx_percentile (mergeable GK
    sketch, same plan shape, rows-only check). Both engines
    interpolate identically on integer counts; floor removes the last
    float boundary.
    """
    l = table(spark, sf_dir, "lineitem")
    g = l.groupBy("l_orderkey").agg(F.count("*").alias("n"))
    return g.agg(
        F.count("*").alias("n_keys"),
        F.max("n").alias("max_rows"),
        F.sum("n").alias("total_rows"),
        F.round(F.sum("n").cast("double") / F.count("*"), 6).alias("mean_rows"),
        F.floor(F.expr("percentile(n, array(0.5, 0.99))[0]"))
        .cast("long")
        .alias("p50"),
        F.floor(F.expr("percentile(n, array(0.5, 0.99))[1]"))
        .cast("long")
        .alias("p99"),
        F.round(
            F.max("n").cast("double")
            * F.count("*")
            / F.sum("n").cast("double"),
            6,
        ).alias("skew_factor"),
    )


@register(
    "exact_percentiles_global",
    oracle="""
    WITH r AS (
      SELECT l_extendedprice AS v,
             row_number() OVER (ORDER BY l_extendedprice, l_orderkey,
                                         l_linenumber) AS rn,
             count(*) OVER () AS n
      FROM lineitem
    )
    SELECT p.q, r.v AS value
    FROM r JOIN (VALUES (0.5), (0.9), (0.99), (0.999)) p(q)
      ON r.rn = 1 + CAST(floor(p.q * (r.n - 1)) AS BIGINT)
    """,
)
def exact_percentiles_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT global percentiles (p50/p90/p99/p999, disc method) of
    l_extendedprice — the exact twin of the approximate sketches
    (percentiles_approx / KMV): rank indices come from the two-pass
    global row numbering (operators/ranking.py, 6th production use),
    never a single-partition window, and only the 4 picked rows leave
    the rank join.

    Index arithmetic is done driver-side with EXACT rationals
    (Fraction), because 1 + floor(q·(n-1)) computed in doubles misses
    the boundary when q·(n-1) is integral (0.999·1000 = 998.999… in
    IEEE) — the DuckDB oracle's DECIMAL literals are exact, so the
    engines would disagree exactly at those cliffs."""
    from fractions import Fraction

    from csv2parquet_spark.operators.ranking import global_row_number

    li = table(spark, sf_dir, "lineitem").select(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    ranked, n = global_row_number(
        li, ["l_extendedprice", "l_orderkey", "l_linenumber"]
    )
    picks = [
        (float(q), 1 + int(Fraction(str(q)) * (n - 1)))
        for q in (0.5, 0.9, 0.99, 0.999)
    ]
    from csv2parquet_spark.queries.helpers import local_result_df

    # VALUES LocalRelation, not createDataFrame(list): the broadcast
    # build of a pickled-RDD relation pays a Python-worker round per
    # slice (r11 profiling, see helpers.local_result_df)
    pick_df = F.broadcast(local_result_df(spark, picks, "q double, rn bigint"))
    return ranked.join(pick_df, "rn").select(
        "q", F.col("l_extendedprice").alias("value")
    )


@register(
    "cdc_merge_apply",
    oracle="""
    WITH delta AS (
      SELECT o_orderkey AS k, 'delete' AS op,
             CAST(NULL AS DOUBLE) AS new_price
      FROM orders WHERE o_orderkey % 17 = 0
      UNION ALL
      SELECT o_orderkey, 'update', round(o_totalprice + 100.0, 2)
      FROM orders WHERE o_orderkey % 17 <> 0 AND o_orderkey % 10 = 3
      UNION ALL
      SELECT -o_orderkey, 'insert', 42.0
      FROM orders WHERE o_orderkey % 25 = 0
    )
    SELECT COALESCE(b.o_orderkey, d.k) AS o_orderkey,
           round(CASE WHEN d.op = 'update' THEN d.new_price
                      WHEN d.op = 'insert' THEN d.new_price
                      ELSE b.o_totalprice END, 2) AS o_totalprice,
           COALESCE(d.op, 'keep') AS op
    FROM orders b FULL OUTER JOIN delta d ON b.o_orderkey = d.k
    WHERE d.op IS NULL OR d.op <> 'delete'
    """,
)
def cdc_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics as one key-partitioned full-outer join (the
    warehouse CDC-apply shape: WHEN MATCHED AND op='delete' DELETE,
    WHEN MATCHED AND op='update' UPDATE, WHEN NOT MATCHED INSERT): a
    deterministic delta derived from the base itself (deletes for
    key%17=0, +100 price updates for key%10=3, inserts at -key for
    key%25=0 — NEGATED keys are a namespace disjoint from the 1-based
    o_orderkey at EVERY scale factor, so synthetic inserts can never
    collide with real base keys and silently match) applies onto
    orders, emitting the post-merge state with each row's provenance.

    Scale shape: ONE shuffle on the merge key for each side of the
    full-outer hash join — delta cost is ∝ |delta| on the build side at
    real CDC volumes (AQE broadcasts a small delta); no window, no
    driver loop. The delete filter runs post-join so the anti-join is
    not a second shuffle."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    delta = (
        o.filter(F.col("o_orderkey") % 17 == 0)
        .select(
            F.col("o_orderkey").alias("k"),
            F.lit("delete").alias("op"),
            F.lit(None).cast("double").alias("new_price"),
        )
        .unionAll(
            o.filter((F.col("o_orderkey") % 17 != 0) & (F.col("o_orderkey") % 10 == 3))
            .select(
                F.col("o_orderkey").alias("k"),
                F.lit("update").alias("op"),
                F.round(F.col("o_totalprice") + 100.0, 2).alias("new_price"),
            )
        )
        .unionAll(
            o.filter(F.col("o_orderkey") % 25 == 0).select(
                (-F.col("o_orderkey")).alias("k"),
                F.lit("insert").alias("op"),
                F.lit(42.0).alias("new_price"),
            )
        )
    )
    merged = o.join(delta, o.o_orderkey == delta.k, "full_outer")
    return merged.filter(
        F.col("op").isNull() | (F.col("op") != "delete")
    ).select(
        F.coalesce("o_orderkey", "k").alias("o_orderkey"),
        F.round(
            F.when(F.col("op").isin("update", "insert"), F.col("new_price")).otherwise(
                F.col("o_totalprice")
            ),
            2,
        ).alias("o_totalprice"),
        F.coalesce("op", F.lit("keep")).alias("op"),
    )


@register(
    "table_profile_orders",
    oracle="""
    SELECT 'o_orderkey' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           CAST(min(o_orderkey) AS VARCHAR) AS min_repr,
           CAST(max(o_orderkey) AS VARCHAR) AS max_repr
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT o_orderstatus) AS BIGINT),
           min(o_orderstatus), max(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT o_orderpriority) AS BIGINT),
           min(o_orderpriority), max(o_orderpriority)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT o_totalprice) AS BIGINT),
           CAST(CAST(min(o_totalprice) AS DECIMAL(14,2)) AS VARCHAR),
           CAST(CAST(max(o_totalprice) AS DECIMAL(14,2)) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderdate', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT o_orderdate) AS BIGINT),
           strftime(min(o_orderdate), '%Y-%m-%d'),
           strftime(max(o_orderdate), '%Y-%m-%d')
    FROM orders
    """,
)
def table_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of the orders table (rows / nulls / exact distinct
    / min / max per column) in ONE scan — the data-profiling report
    every warehouse onboarding runs. The multi-column exact distinct
    plans as a single Expand-backed agg (×k partial rows, k=5 here);
    min/max are cast to string-stable representations (decimal for the
    double column, yyyy-MM-dd for the date) so both engines print the
    same value. See operators/pipeline.py:profile_columns."""
    from csv2parquet_spark.operators.pipeline import profile_columns

    o = table(spark, sf_dir, "orders")
    return profile_columns(
        o,
        {
            "o_orderkey": F.col("o_orderkey"),
            "o_orderstatus": F.col("o_orderstatus"),
            "o_orderpriority": F.col("o_orderpriority"),
            "o_totalprice": F.col("o_totalprice").cast("decimal(14,2)"),
            "o_orderdate": F.date_format("o_orderdate", "yyyy-MM-dd"),
        },
    )


@register(
    "rfm_customer_segments",
    oracle="""
    WITH c AS (
      -- a NULL custkey is not a customer; a customer whose every
      -- order date (or price) is NULL has no recency (or monetary)
      -- and cannot be quartiled (NULL-twin contract: NULL metrics
      -- would land at opposite ends of the engines' ntile orderings)
      SELECT o_custkey,
             max(epoch_ms(o_orderdate)) AS recency_ms,
             count(*) AS frequency,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
               AS monetary
      FROM orders WHERE o_custkey IS NOT NULL GROUP BY o_custkey
    ), q AS (
      SELECT o_custkey,
             ntile(4) OVER (ORDER BY recency_ms, o_custkey) AS r_q,
             ntile(4) OVER (ORDER BY frequency, o_custkey) AS f_q,
             ntile(4) OVER (ORDER BY monetary, o_custkey) AS m_q
      FROM c
      WHERE recency_ms IS NOT NULL AND monetary IS NOT NULL
    )
    SELECT r_q, f_q, m_q, CAST(count(*) AS BIGINT) AS n_customers
    FROM q GROUP BY r_q, f_q, m_q
    """,
)
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (the CRM staple): per customer, recency of last
    order / order frequency / monetary total, each cut into quartiles,
    rolled up to segment counts. All three global quartile cuts run on
    the two-pass ranking machinery (operators/ranking.py — never a
    single-partition window), each over the CUSTOMER aggregate (a
    dimension, not the fact table); the fact scan collapses to one
    partial-agg groupBy first."""
    from csv2parquet_spark.operators.ranking import rank_stats

    # NULL-custkey orders and unquartile-able customers are excluded
    # by contract (see oracle note)
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey").isNotNull())
    c = o.groupBy("o_custkey").agg(
        F.max(F.unix_millis("o_orderdate")).alias("recency_ms"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .cast("double")
        .alias("monetary"),
    ).filter(
        F.col("recency_ms").isNotNull() & F.col("monetary").isNotNull()
    )
    r = rank_stats(c, ["recency_ms", "o_custkey"], tiles=4).select(
        "o_custkey", F.col("quartile").alias("r_q")
    )
    f = rank_stats(c, ["frequency", "o_custkey"], tiles=4).select(
        "o_custkey", F.col("quartile").alias("f_q")
    )
    m = rank_stats(c, ["monetary", "o_custkey"], tiles=4).select(
        "o_custkey", F.col("quartile").alias("m_q")
    )
    return (
        r.join(f, "o_custkey")
        .join(m, "o_custkey")
        .groupBy("r_q", "f_q", "m_q")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "grouped_percentiles_exact",
    oracle="""
    WITH r AS (
      SELECT o_orderpriority AS grp, o_totalprice AS v,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             count(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders
      -- a percentile is defined over the NON-NULL values; without the
      -- filter Spark ranks NULLs FIRST and DuckDB LAST, so every
      -- quantile index lands on a different row (NULL-twin audit r10)
      WHERE o_totalprice IS NOT NULL
    )
    SELECT grp, p.q, r.v AS value
    FROM r JOIN (VALUES (0.5), (0.9), (0.99)) p(q)
      ON r.rn = 1 + CAST(floor(p.q * (r.n - 1)) AS BIGINT)
    """,
)
def grouped_percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-group percentiles (disc) of order value by priority —
    the grouped twin of exact_percentiles_global: the window partitions
    by the GROUP key, so it is one hash exchange with per-group state
    (scale-safe, unlike a global-order window); the rank→quantile index
    arithmetic stays in integers via DECIMAL literals on both engines
    (q·(n−1) is exact for these q)."""
    # NULL values carry no rank (see oracle note)
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice").isNotNull())
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wc = Window.partitionBy("o_orderpriority")
    r = o.select(
        F.col("o_orderpriority").alias("grp"),
        F.col("o_totalprice").alias("v"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    from csv2parquet_spark.queries.helpers import local_result_df

    picks = F.broadcast(
        local_result_df(o.sparkSession, [(0.5,), (0.9,), (0.99,)], "q double")
    )
    # q·(n−1) in doubles is exact here: 0.5/0.9/0.99 × (n−1) floors
    # identically to DECIMAL for n below ~2^40 except at integral
    # products of 0.99 — mirror the oracle by computing in DECIMAL.
    idx = 1 + F.floor(
        F.col("q").cast("decimal(10,4)") * (F.col("n") - 1)
    ).cast("bigint")
    return (
        r.crossJoin(picks)
        .filter(F.col("rn") == idx)
        .select("grp", "q", F.col("v").alias("value"))
    )


@register(
    "benford_first_digit_audit",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(14,2)) AS VARCHAR),
                         1, 1) AS INTEGER) AS digit
      FROM orders WHERE o_totalprice >= 1.0
    ), n AS (SELECT count(*) AS n FROM d)
    SELECT digit, CAST(count(*) AS BIGINT) AS n_values,
           round(count(*) * 1.0 / n.n, 6) AS frac,
           round(log10(1.0 + 1.0 / digit), 6) AS benford_expected
    FROM d, n GROUP BY digit, n.n
    """,
)
def benford_first_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the classic
    forensic data-quality screen (fabricated or truncated numeric
    columns drift from log10(1 + 1/d)). First digit extracted from the
    DECIMAL(14,2) string form on both engines (identical rendering);
    one map-side projection + a 9-group aggregate; the denominator is
    derived from the (≤9-row, localCheckpoint-pinned) grouped result —
    ONE scan of the fact table, not a count() pre-pass."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1.0)
    d = o.select(
        F.substring(
            F.col("o_totalprice").cast("decimal(14,2)").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    g = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n_values")).localCheckpoint()
    total = F.broadcast(g.agg(F.sum("n_values").alias("__n")))
    return g.crossJoin(total).select(
        "digit",
        "n_values",
        F.round(F.col("n_values") * 1.0 / F.col("__n"), 6).alias("frac"),
        F.round(F.log10(1.0 + 1.0 / F.col("digit")), 6).alias("benford_expected"),
    )


@register(
    "k_anonymity_report",
    oracle="""
    WITH classes AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 4000) AS BIGINT) AS bal_band,
             CAST(count(*) AS BIGINT) AS class_size
      FROM customer
      GROUP BY 1, 2, 3
    )
    SELECT c_nationkey, c_mktsegment, bal_band, class_size
    FROM classes WHERE class_size < 4
    """,
)
def k_anonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy-governance check before a dataset release: k-anonymity
    over the quasi-identifier tuple (nation, market segment, account-
    balance band) — every equivalence class smaller than k=4 is a
    re-identification risk (an attacker who knows someone's nation +
    segment + rough balance pins them to <4 candidate rows). Output is
    the violating classes with their sizes — the rows a release would
    have to suppress or generalize further.

    Scale shape: ONE partial-aggregated groupBy on the quasi-identifier
    key (map-side combine collapses to the class space, which is
    bounded by the generalization grid, not the row count) + a
    class-size filter. Banding uses floor(x/4000) — float floor agrees
    across engines away from exact band boundaries, and the fixture's
    2-decimal balances never sit on a multiple of 4000 exactly."""
    c = table(spark, sf_dir, "customer")
    classes = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 4000).alias("bal_band"),
    ).agg(F.count(F.lit(1)).alias("class_size"))
    return classes.filter(F.col("class_size") < 4)


@register(
    "l_diversity_report",
    oracle="""
    WITH rel AS (
      SELECT c.c_nationkey, c.c_mktsegment,
             CAST(floor(c.c_acctbal / 4000) AS BIGINT) AS bal_band,
             o.o_orderpriority AS sens
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    )
    SELECT c_nationkey, c_mktsegment, bal_band,
           CAST(count(*) AS BIGINT) AS class_size,
           CAST(count(DISTINCT sens) AS BIGINT) AS n_sensitive,
           CAST(CASE WHEN count(DISTINCT sens) < 3 THEN 1 ELSE 0 END
                AS BIGINT) AS violates_l3
    FROM rel GROUP BY 1, 2, 3
    """,
)
def l_diversity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The l-diversity complement of ``k_anonymity_report``: k-anonymity
    alone still leaks when every row in an equivalence class SHARES the
    sensitive value (the homogeneity attack — "all 5 candidates have
    the same order priority" identifies the priority without
    identifying the person). Per quasi-identifier class (nation,
    segment, balance band) over the joined purchase release, report
    class size, the number of DISTINCT sensitive values, and the l=3
    violation flag — the full governance sheet, not only the failures,
    so the release reviewer sees margins, and the hash check bites on
    every class.

    Scale shape: one broadcast-dim join (customer attributes onto the
    fact) + ONE partial-aggregated groupBy on the class key;
    count(DISTINCT) over a 5-value domain carries a bounded per-class
    state. Class space = the generalization grid, not row count."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    rel = o.join(
        F.broadcast(
            c.select(
                "c_custkey",
                "c_nationkey",
                "c_mktsegment",
                F.floor(F.col("c_acctbal") / 4000).alias("bal_band"),
            )
        ),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    return rel.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
        F.count(F.lit(1)).alias("class_size"),
        F.countDistinct("o_orderpriority").alias("n_sensitive"),
        F.when(F.countDistinct("o_orderpriority") < 3, 1)
        .otherwise(0)
        .cast("long")
        .alias("violates_l3"),
    )


@register(
    "revenue_concentration_report",
    oracle="""
    WITH rel AS (
      SELECT o_custkey AS c,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS rev
      FROM orders GROUP BY 1
    ), ranked AS (
      SELECT c, rev,
             CAST(row_number() OVER (ORDER BY rev, c) AS BIGINT) AS rn,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM rel
    )
    SELECT CAST(max(n) AS BIGINT) AS n_customers,
           CAST(sum(rev) AS BIGINT) AS total_cents,
           round(CAST(2 * sum(rn * rev) AS DOUBLE)
                 / (CAST(max(n) AS DOUBLE) * sum(rev))
                 - CAST(max(n) + 1 AS DOUBLE) / max(n), 6) AS gini,
           round(CAST(sum(CAST(rev AS DECIMAL(38,0))
                          * CAST(rev AS DECIMAL(38,0))) AS DOUBLE)
                 / (CAST(sum(rev) AS DOUBLE) * sum(rev)), 6) AS hhi,
           round(CAST(sum(CASE WHEN rn > max_n - max_n // 10
                               THEN rev ELSE 0 END) AS DOUBLE)
                 / sum(rev), 6) AS top_decile_share
    FROM (SELECT *, max(n) OVER () AS max_n FROM ranked)
    """,
)
def revenue_concentration_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration readout over customers: exact Gini
    coefficient (rank formula G = 2·Σi·xᵢ/(n·Σx) − (n+1)/n on the
    ascending-revenue order), Herfindahl-Hirschman index (Σ share²),
    and the top-decile revenue share — the "how dependent are we on a
    few whales" governance sheet, and the same math a data-mixture
    report uses for source concentration.

    Exactness: per-customer revenue in integer cents; the global rank
    comes from the two-pass ``global_row_number`` (no single-partition
    sort), Σ i·xᵢ and the top-decile numerator are BIGINT, Σ x² goes
    through DECIMAL(38,0) (x² overflows int64 at whale magnitudes),
    and each output is one closed-form double of those integers.

    Scale shape: one partial-agg to the customer grain, one two-pass
    ranking, one global aggregate.
    """
    from csv2parquet_spark.operators.ranking import global_row_number

    o = table(spark, sf_dir, "orders")
    rel = (
        o.select(
            F.col("o_custkey").alias("c"),
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
        )
        .groupBy("c")
        .agg(F.sum("cents").alias("rev"))
    )
    ranked, n = global_row_number(rel, keys=["rev", "c"])
    gini = (
        (2 * F.sum(F.col("rn") * F.col("rev"))).cast("double")
        / (F.lit(float(n)) * F.sum("rev"))
        - F.lit(float(n + 1)) / F.lit(float(n))
    )
    hhi = F.sum(
        F.col("rev").cast("decimal(38,0)") * F.col("rev").cast("decimal(38,0)")
    ).cast("double") / (F.sum("rev").cast("double") * F.sum("rev"))
    cutoff = n - n // 10
    top = (
        F.sum(F.when(F.col("rn") > cutoff, F.col("rev")).otherwise(0))
        .cast("double")
        / F.sum("rev")
    )
    return ranked.agg(
        F.lit(n).cast("long").alias("n_customers"),
        F.sum("rev").alias("total_cents"),
        F.round(gini, 6).alias("gini"),
        F.round(hhi, 6).alias("hhi"),
        F.round(top, 6).alias("top_decile_share"),
    )


@register(
    "t_closeness_report",
    oracle="""
    WITH rel AS MATERIALIZED (
      SELECT c.c_nationkey, c.c_mktsegment,
             CAST(floor(c.c_acctbal / 4000) AS BIGINT) AS bal_band,
             o.o_orderpriority AS sens
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    ), gdist AS MATERIALIZED (
      SELECT sens, count(*) AS cq,
             sum(count(*)) OVER (ORDER BY sens
                                 ROWS UNBOUNDED PRECEDING) AS cqc
      FROM rel GROUP BY sens
    ), tot AS (
      SELECT sum(cq) AS n, count(*) AS m FROM gdist
    ), cell AS MATERIALIZED (
      SELECT c_nationkey, c_mktsegment, bal_band, sens, count(*) AS cp
      FROM rel GROUP BY 1, 2, 3, 4
    ), classes AS (
      SELECT c_nationkey, c_mktsegment, bal_band, sum(cp) AS n_c
      FROM cell GROUP BY 1, 2, 3
    ), grid AS (
      SELECT cl.c_nationkey, cl.c_mktsegment, cl.bal_band, cl.n_c,
             g.sens, g.cqc, coalesce(ce.cp, 0) AS cp
      FROM classes cl
      CROSS JOIN gdist g
      LEFT JOIN cell ce
        ON ce.c_nationkey = cl.c_nationkey
       AND ce.c_mktsegment = cl.c_mktsegment
       AND ce.bal_band = cl.bal_band AND ce.sens = g.sens
    ), cums AS (
      SELECT c_nationkey, c_mktsegment, bal_band, n_c, cqc,
             sum(cp) OVER (PARTITION BY c_nationkey, c_mktsegment, bal_band
                           ORDER BY sens ROWS UNBOUNDED PRECEDING) AS cpc
      FROM grid
    )
    SELECT c_nationkey, c_mktsegment, bal_band,
           CAST(n_c AS BIGINT) AS class_size,
           CAST((1000000 * sum(abs(cpc * n - cqc * n_c)))
                // ((m - 1) * n_c * n) AS BIGINT) AS t_ppm,
           CAST(CASE WHEN (1000000 * sum(abs(cpc * n - cqc * n_c)))
                          // ((m - 1) * n_c * n) > 200000
                     THEN 1 ELSE 0 END AS BIGINT) AS violates_t02
    FROM cums, tot
    GROUP BY c_nationkey, c_mktsegment, bal_band, n_c, n, m
    """,
)
def t_closeness_report(
    spark: SparkSession, sf_dir: str, on_null: str = "raise"
) -> DataFrame:
    """t-closeness — the third classic anonymity measure, completing
    the governance family next to ``k_anonymity_report`` (class size)
    and ``l_diversity_report`` (distinct sensitive values): l-diversity
    still leaks when a class's sensitive DISTRIBUTION is skewed far
    from the corpus's (the skewness attack — "5 distinct priorities,
    but 90% URGENT" is itself disclosure). Per quasi-identifier class
    (nation, segment, balance band — the family's shared grid), report
    the ordered-EMD distance between the class's priority distribution
    and the global one:

        t = (1/(m−1)) · Σᵢ |CumPᵢ − CumQᵢ|

    computed as EXACT integer arithmetic (the kappa pattern): each
    term is |cpcᵢ·N − cqcᵢ·n_c| / (n_c·N), so t_ppm floor-divides one
    BIGINT sum — no float drift across engines (products need a wider
    type beyond ~3e9 rows; here both factors are corpus counts).
    Output is the full governance sheet with the t > 0.2 flag.

    Scale shape: one broadcast-dim join + ONE partial-aggregated
    groupBy to the (class × 5)-cell grid; the per-class cumsum windows
    over the CLASS GRID (generalization space, never row count); the
    5-row global CDF is collected driver-side (model-sized) and enters
    the plan as literals — no single-partition window anywhere.

    ``on_null="skip"`` quarantines NULL-sensitive-value orders with a
    counted drop (null_policy.py) instead of aborting the report."""
    from csv2parquet_spark.operators.null_policy import check_on_null, skip_nulls

    check_on_null(on_null)
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    if on_null == "skip":
        o = skip_nulls(o, ["o_orderpriority"], "t_closeness_report")
    rel = o.join(
        F.broadcast(
            c.select(
                "c_custkey",
                "c_nationkey",
                "c_mktsegment",
                F.floor(F.col("c_acctbal") / 4000).alias("bal_band"),
            )
        ),
        F.col("o_custkey") == F.col("c_custkey"),
    ).select(
        "c_nationkey", "c_mktsegment", "bal_band",
        F.col("o_orderpriority").alias("sens"),
    )
    cell = rel.groupBy("c_nationkey", "c_mktsegment", "bal_band", "sens").agg(
        F.count(F.lit(1)).alias("cp")
    ).localCheckpoint()
    # Global sensitive CDF: m (=5) rows — driver-side, enters as literals.
    # Derived from the already-materialized cell grid (Σcp per sens), so
    # the customer⋈orders pass runs ONCE, not twice (ADVICE r7).
    grows_raw = cell.groupBy("sens").agg(F.sum("cp").alias("cq")).collect()
    if any(r.sens is None for r in grows_raw):
        # Actionable contract error instead of a bare NoneType-vs-str
        # sort TypeError (r9 NULL-twin audit): a NULL sensitive value
        # has no place on the t-closeness CDF.
        raise ValueError(
            "t_closeness_report: NULL sensitive-attribute values "
            "(o_orderpriority) — fill or filter them first"
        )
    grows = sorted(grows_raw, key=lambda r: r.sens)
    n_total = sum(r.cq for r in grows)
    m = len(grows)
    run, cq_cum = 0, {}
    for r in grows:
        run += r.cq
        cq_cum[r.sens] = run
    cqc_map = F.create_map(
        *[F.lit(x) for s, v in cq_cum.items() for x in (s, v)]
    )
    sens_all = F.array(*[F.lit(r.sens) for r in grows])
    classes = cell.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
        F.sum("cp").alias("n_c")
    )
    # Dense (class × sens) grid so absent cells still advance the CDF.
    grid = (
        classes.select(
            "c_nationkey", "c_mktsegment", "bal_band", "n_c",
            F.explode(sens_all).alias("sens"),
        )
        .join(cell, ["c_nationkey", "c_mktsegment", "bal_band", "sens"], "left")
        .withColumn("cp", F.coalesce(F.col("cp"), F.lit(0)))
    )
    w = (
        Window.partitionBy("c_nationkey", "c_mktsegment", "bal_band")
        .orderBy("sens")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cums = grid.withColumn("cpc", F.sum("cp").over(w)).withColumn(
        "term",
        F.abs(
            F.col("cpc") * F.lit(n_total) - cqc_map[F.col("sens")] * F.col("n_c")
        ),
    )
    # t_ppm = floor(1e6·Σterm / ((m−1)·n_c·N)); every operand is a
    # non-negative BIGINT, so Spark DIV (truncate) == DuckDB // (floor).
    t_ppm = (F.sum("term") * F.lit(1_000_000)).cast("long").alias("tn")
    return (
        cums.groupBy("c_nationkey", "c_mktsegment", "bal_band", "n_c")
        .agg(t_ppm)
        .select(
            "c_nationkey", "c_mktsegment", "bal_band",
            F.col("n_c").cast("long").alias("class_size"),
            F.expr(f"tn DIV ({m - 1} * n_c * {n_total})")
            .cast("long")
            .alias("t_ppm"),
            F.when(
                F.expr(f"tn DIV ({m - 1} * n_c * {n_total})") > 200_000, 1
            )
            .otherwise(0)
            .cast("long")
            .alias("violates_t02"),
        )
    )
