"""TPC-H-shaped multi-way analytical queries beyond Q1/Q3/Q5 (SURVEY.md
§2.2 "Joins"/"Aggregations"): returned-item revenue (Q10-shaped), promo
revenue share (Q14-shaped), priority counts with EXISTS (Q4-shaped),
plus deterministic sampling.

Scale notes: fact⋈fact joins (orders⋈lineitem) shuffle once on the
orderkey; dimension sides (customer slice, nation, part) broadcast.
Q14's month filter reaches the parquet scan as a pushed predicate —
partition pruning at 100 TB when the table is date-partitioned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from csv2parquet_spark.queries.helpers import dsum, sql_dsum
from csv2parquet_spark.queries.registry import register
from csv2parquet_spark.tables import table


@register(
    "q10_returned_revenue",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')},
           count(*) AS n_items
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10-shaped: top-20 customers by revenue lost to returns in 1996.
    lineitem⋈orders shuffles on orderkey once; customer and nation
    broadcast; top-k is TakeOrderedAndProject (no global sort)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    n = table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_returnflag") == "R")
        .join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(rev, "revenue"), F.count("*").alias("n_items"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q14_promo_revenue_share",
    oracle="""
    SELECT round(
             100.0 * CAST(sum(CAST(CASE WHEN p.p_type = 'PROMO'
                       THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END
                       AS DECIMAL(18,6))) AS DOUBLE)
             / CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                       AS DECIMAL(18,6))) AS DOUBLE), 6) AS promo_share_pct,
           count(*) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
    """,
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14-shaped: % of March-1997 revenue from PROMO parts. The month
    predicate is pushed to the scan; part broadcasts (no fact shuffle)."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    dec = "decimal(18,6)"
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(promo_rev.cast(dec)).cast("double")
                / F.sum(rev.cast(dec)).cast("double"),
                6,
            ).alias("promo_share_pct"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q4_priority_order_counts",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o.o_orderpriority
    """,
)
def q4_priority_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4-shaped: orders (one quarter) with at least one line shipped
    after the order date, counted per priority. The EXISTS is a left-semi
    join — shuffles both sides on orderkey, emits each order once."""
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    filtered = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    return (
        filtered.join(
            l,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "sample_lineitem_seeded",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_total,
           CAST(100000 AS BIGINT) AS fraction_ppm,
           true AS in_chernoff_bounds,
           true AS sample_is_subset,
           true AS without_replacement
    FROM lineitem
    """,
)
def sample_lineitem_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sampling, audited by its statistical contract —
    the rows-only→bound-oracle conversion (VERDICT r6 #2): the RNG
    stream is engine-specific so the ROW SET can't hash-match DuckDB,
    but the contract can. The oracle pins: the sampled count lands
    within a 6σ Chernoff band around 0.1·N (binomial σ = √(p(1−p)N);
    a wrong fraction, a double-applied filter, or a broken seed walks
    out of the band), every sampled key exists in the input (anti-join
    empty), and sampling is WITHOUT replacement — per key, the sampled
    multiplicity never exceeds the input multiplicity (the synthetic
    lineitem's (orderkey, linenumber) is NOT unique, so a distinct-key
    check would be wrong; the multiplicity bound is the real Bernoulli
    invariant). At scale sampling stays a map-only filter; the audit
    adds one count and two key-joins."""
    l = table(spark, sf_dir, "lineitem")
    keys = ["l_orderkey", "l_linenumber"]
    s = l.sample(fraction=0.1, seed=42).select(*keys)
    tot = l.agg(F.count(F.lit(1)).alias("n_total"))
    ss = s.agg(F.count(F.lit(1)).alias("n_sampled"))
    outside = s.join(l.select(*keys), keys, "left_anti").agg(
        F.count(F.lit(1)).alias("n_outside")
    )
    over = (
        s.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_s"))
        .join(
            l.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_in")), keys, "left"
        )
        .agg(
            F.sum(
                F.when(
                    F.col("n_in").isNull() | (F.col("n_s") > F.col("n_in")), 1
                ).otherwise(0)
            ).alias("n_over")
        )
    )
    p = 0.1
    band = F.lit(6.0) * F.sqrt(F.lit(p * (1 - p)) * F.col("n_total")) + F.lit(1.0)
    return (
        tot.crossJoin(F.broadcast(ss))
        .crossJoin(F.broadcast(outside))
        .crossJoin(F.broadcast(over))
        .select(
            F.col("n_total").cast("long").alias("n_total"),
            F.lit(100000).cast("long").alias("fraction_ppm"),
            (
                F.abs(F.col("n_sampled") - F.lit(p) * F.col("n_total")) <= band
            ).alias("in_chernoff_bounds"),
            (F.col("n_outside") == 0).alias("sample_is_subset"),
            (F.coalesce(F.col("n_over"), F.lit(0)) == 0).alias(
                "without_replacement"
            ),
        )
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6)))
                AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.05
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped: pure scan-filter-aggregate — every predicate
    pushes to the parquet scan, no join, no wide exchange; the canonical
    'how fast can you read' query."""
    l = table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.05)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,6)"))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q18_large_orders",
    oracle=f"""
    SELECT c.c_name, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS order_day,
           {sql_dsum('l.l_quantity', 'total_qty')}
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY 1, 2, 3
    HAVING sum(CAST(l.l_quantity AS DECIMAL(18,6))) > 250
    ORDER BY total_qty DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped: orders whose total quantity exceeds a HAVING
    threshold, top-100. The aggregate runs on the orderkey shuffle the
    join already produced; customer broadcasts."""
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    c = table(spark, sf_dir, "customer")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
        )
        .agg(dsum(F.col("l_quantity"), "total_qty"))
        .filter(F.col("total_qty") > 250)
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(100)
    )


@register(
    "sample_stratified_by_status",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_stratum,
           CAST(CASE o_orderstatus WHEN 'O' THEN 50000
                                   WHEN 'F' THEN 200000
                                   ELSE 500000 END AS BIGINT) AS fraction_ppm,
           true AS in_chernoff_bounds,
           true AS sample_is_subset
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def sample_stratified_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling (sampleBy — a different fraction per stratum,
    how a training pipeline rebalances sources), audited per stratum by
    its statistical contract (the rows-only→bound-oracle conversion,
    VERDICT r6 #2): each stratum's sampled count lands within a 6σ
    Chernoff band around fₛ·Nₛ, and every sampled key belongs to its
    stratum in the input. Swapped fractions (O↔P), a stratum silently
    dropped, or leakage across strata all flip a pinned boolean. The
    sample itself stays a map-only filter."""
    o = table(spark, sf_dir, "orders")
    fractions = {"O": 0.05, "F": 0.2, "P": 0.5}
    frac = F.create_map(
        *[F.lit(x) for kv in fractions.items() for x in kv]
    )[F.col("o_orderstatus")]
    s = o.sampleBy("o_orderstatus", fractions=fractions, seed=42).select(
        "o_orderkey", "o_orderstatus"
    )
    totals = o.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n_stratum"))
    sampled = s.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n_sampled"))
    outside = (
        s.join(o.select("o_orderkey", "o_orderstatus"),
               ["o_orderkey", "o_orderstatus"], "left_anti")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_outside"))
    )
    band = (
        F.lit(6.0) * F.sqrt(frac * (F.lit(1.0) - frac) * F.col("n_stratum"))
        + F.lit(1.0)
    )
    return (
        totals.join(F.broadcast(sampled), "o_orderstatus", "left")
        .join(F.broadcast(outside), "o_orderstatus", "left")
        .select(
            "o_orderstatus",
            F.col("n_stratum").cast("long").alias("n_stratum"),
            F.round(frac * 1_000_000).cast("long").alias("fraction_ppm"),
            (
                F.abs(
                    F.coalesce(F.col("n_sampled"), F.lit(0))
                    - frac * F.col("n_stratum")
                )
                <= band
            ).alias("in_chernoff_bounds"),
            (F.coalesce(F.col("n_outside"), F.lit(0)) == 0).alias(
                "sample_is_subset"
            ),
        )
    )


@register(
    "sample_stratified_exact_k",
    oracle="""
    SELECT o_orderstatus, o_orderkey, o_totalprice FROM (
      SELECT o_orderstatus, o_orderkey, o_totalprice,
             row_number() OVER (
               PARTITION BY o_orderstatus
               ORDER BY md5(CAST(o_orderkey AS VARCHAR))
             ) AS rn
      FROM orders
    ) WHERE rn <= 20
    """,
)
def sample_stratified_exact_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified EXACT-k sampling: the k rows per stratum
    with the smallest md5(key) — a hash-ranked uniform draw that both
    engines reproduce (upgrading the seeded sampleBy variant's
    rows-only check to a hash match). Scale shape: the rank-limited
    window plans WindowGroupLimit PARTIAL below the exchange, so each
    input partition forwards at most k rows per stratum — the shuffle
    carries O(partitions·strata·k), never the corpus."""
    from pyspark.sql.window import Window

    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.md5(F.col("o_orderkey").cast("string"))
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("o_orderstatus", "o_orderkey", "o_totalprice")
    )
