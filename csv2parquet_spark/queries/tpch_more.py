"""The remaining TPC-H-shaped queries (SURVEY.md §2.2) — with Q1/Q3/Q4/Q5/
Q6/Q10/Q14/Q18 elsewhere, this module completes a 22/22 shape sweep of the
TPC-H query set, adapted to the driver's reduced star schema (no partsupp,
no commit/receipt dates, no phone): partsupp-bound queries (Q2/Q11/Q16/Q20)
derive their per-(part,supplier) facts from lineitem; lateness (Q12/Q21)
is l_shipdate vs o_orderdate.

Scale notes (the plans to preserve at 100 TB):
* fact⋈fact joins shuffle ONCE on the join key and reuse that exchange for
  the following groupBy where keys align (orderkey joins → orderkey aggs).
* nation/region/supplier/part broadcast (at real scale part stops fitting —
  then it becomes the build side of a shuffled hash join; the code stays
  identical, AQE picks the strategy).
* scalar-subquery thresholds (Q11/Q15/Q17/Q20/Q22) are computed as 1-row
  DataFrames and broadcast-cross-joined — never collected to the driver.
* every double aggregate goes through the decimal-sum discipline in
  helpers.py so hashes match DuckDB under any partial-agg association order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from csv2parquet_spark.queries.helpers import davg, dsum, sql_davg, sql_dsum
from csv2parquet_spark.queries.registry import register
from csv2parquet_spark.tables import table

_REV = "l_extendedprice * (1 - l_discount)"


def _rev() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "q2_min_price_supplier",
    oracle=f"""
    WITH ps AS (
      SELECT l_partkey, l_suppkey, {sql_davg('l_extendedprice', 'avg_price')}
      FROM lineitem GROUP BY 1, 2
    ), m AS (
      SELECT l_partkey, min(avg_price) AS min_price FROM ps GROUP BY 1
    )
    SELECT p.p_partkey, p.p_name, s.s_name, n.n_name, ps.avg_price AS best_price
    FROM ps
    JOIN m ON m.l_partkey = ps.l_partkey AND ps.avg_price = m.min_price
    JOIN part p ON p.p_partkey = ps.l_partkey
              AND p.p_size <= 15 AND p.p_type = 'SMALL'
    JOIN supplier s ON s.s_suppkey = ps.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    ORDER BY best_price, p.p_partkey, s.s_name
    LIMIT 100
    """,
)
def q2_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2-shaped (partsupp adapted to lineitem): per part, the supplier(s)
    with the lowest observed average sale price. The correlated-min
    subquery is a window MIN over the (part,supplier) aggregate — one
    shuffle on l_partkey serves both the groupBy and the window. Averages
    are rounded to 6dp on both sides so the min-equality is exact."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    ps = l.groupBy("l_partkey", "l_suppkey").agg(
        davg(F.col("l_extendedprice"), "avg_price")
    )
    w = Window.partitionBy("l_partkey")
    best = ps.withColumn("min_price", F.min("avg_price").over(w)).filter(
        F.col("avg_price") == F.col("min_price")
    )
    return (
        best.join(
            F.broadcast(p.filter((F.col("p_size") <= 15) & (F.col("p_type") == "SMALL"))),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            "p_partkey", "p_name", "s_name", "n_name",
            F.col("avg_price").alias("best_price"),
        )
        .orderBy("best_price", "p_partkey", "s_name")
        .limit(100)
    )


@register(
    "q7_nation_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l.l_shipdate) AS ship_year,
           {sql_dsum(_REV.replace('l_', 'l.l_'), 'revenue')},
           count(*) AS n_items
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY 1, 2, 3
    """,
)
def q7_nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7-shaped: trade volume between two nations by ship year, both
    directions. lineitem⋈orders shuffles on orderkey, then one shuffle on
    custkey; supplier and both nation copies broadcast. The nation-pair
    disjunction is applied after the broadcasts (cheap, map-side)."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("sn_key") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("cn_key") == F.col("c_nationkey"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year")
        )
        .agg(dsum(_rev(), "revenue"), F.count("*").alias("n_items"))
    )


@register(
    "q8_market_share",
    oracle=f"""
    SELECT year(o.o_orderdate) AS order_year,
           round(
             CAST(sum(CAST(CASE WHEN n1.n_name = 'NATION_3'
                      THEN {_REV.replace('l_', 'l.l_')} ELSE 0 END
                      AS DECIMAL(18,6))) AS DOUBLE)
             / CAST(sum(CAST({_REV.replace('l_', 'l.l_')}
                      AS DECIMAL(18,6))) AS DOUBLE), 6) AS mkt_share
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n2.n_regionkey AND r.r_name = 'ASIA'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    GROUP BY 1
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8-shaped: NATION_3 suppliers' share of revenue sold to ASIA-region
    customers, per order year. Conditional numerator and total run in the
    SAME aggregate pass (no second scan); region restriction rides the
    broadcast nation⋈region dim before touching the fact join."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    asia_nations = (
        n.join(
            r.filter(F.col("r_name") == "ASIA"),
            F.col("r_regionkey") == F.col("n_regionkey"),
        ).select(F.col("n_nationkey").alias("cn_key"))
    )
    n1 = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev = _rev()
    dec = "decimal(18,6)"
    nation_rev = F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(F.lit(0.0))
    return (
        l.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(asia_nations), F.col("cn_key") == F.col("c_nationkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("sn_key") == F.col("s_nationkey"))
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.round(
                F.sum(nation_rev.cast(dec)).cast("double")
                / F.sum(rev.cast(dec)).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "q9_profit_by_nation_year",
    oracle="""
    SELECT n.n_name AS nation, year(o.o_orderdate) AS order_year,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                         - 0.5 * p.p_retailprice * l.l_quantity
                    AS DECIMAL(18,6))) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%widget%'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY 1, 2
    """,
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9-shaped (supplycost := 0.5·retailprice): profit on widget parts by
    supplier nation and order year. The p_name LIKE filter prunes part
    BEFORE it broadcasts; per-row profit is an IEEE double expression
    (deterministic), only the sum is decimal-stabilized."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    p = table(spark, sf_dir, "part")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    profit = _rev() - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        l.join(
            F.broadcast(p.filter(F.col("p_name").like("%widget%"))),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("order_year")
        )
        .agg(dsum(profit, "profit"))
    )


@register(
    "q11_value_concentration",
    oracle="""
    WITH v AS (
      SELECT n.n_name, l.l_partkey,
             CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                      AS DECIMAL(18,6))) AS DOUBLE) AS part_value
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      GROUP BY 1, 2
    )
    SELECT n_name, l_partkey, part_value
    FROM v
    WHERE part_value > 0.001 * (
      SELECT CAST(sum(CAST(part_value AS DECIMAL(18,6))) AS DOUBLE) FROM v)
    """,
)
def q11_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11-shaped (partsupp value := lineitem revenue): (nation, part)
    groups holding more than 0.1% of total traded value. The global total
    is a 1-row DataFrame broadcast into the filter — no driver collect;
    the HAVING-over-scalar-subquery shape Catalyst plans as two aggregates
    sharing one shuffle input."""
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    v = (
        l.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name", "l_partkey")
        .agg(dsum(_rev(), "part_value"))
    )
    total = v.agg(dsum(F.col("part_value"), "total_value"))
    return (
        v.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > 0.001 * F.col("total_value"))
        .select("n_name", "l_partkey", "part_value")
    )


@register(
    "q12_late_shipment_priority",
    oracle="""
    SELECT CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) > 90
                  THEN 'very-late'
                WHEN date_diff('day', o.o_orderdate, l.l_shipdate) > 30
                  THEN 'late'
                ELSE 'ontime' END AS ship_bucket,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY 1
    """,
)
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12-shaped (shipmode → lateness buckets): line counts of high- vs
    low-priority orders per shipping-delay bucket. One orderkey shuffle;
    the bucket is a map-side expression; conditional counts are a single
    aggregate pass."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    delay = F.datediff("l_shipdate", "o_orderdate")
    bucket = (
        F.when(delay > 90, "very-late").when(delay > 30, "late").otherwise("ontime")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(bucket.alias("ship_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            # when(~high), not otherwise(1): a NULL priority is UNKNOWN
            # under SQL's NOT IN three-valued logic and belongs to
            # neither bucket — otherwise(1) silently counted it as low
            # (NULL-twin contract r11).
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q13_customer_order_distribution",
    oracle="""
    WITH c_orders AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                        AND o.o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY 1
    )
    SELECT c_count, count(*) AS custdist
    FROM c_orders GROUP BY 1
    """,
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13-shaped: histogram of orders-per-customer (zero included via the
    left-outer join; the priority exclusion lives in the JOIN condition so
    customers with only excluded orders still count as zero). Two-level
    aggregation: custkey shuffle, then the tiny c_count regroup."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    c_orders = (
        c.join(
            o.filter(F.col("o_orderpriority") != "4-NOT SPECIFIED"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return c_orders.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey, {sql_dsum(_REV, 'total_rev')}
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00'
      GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM supplier s JOIN rev r ON r.l_suppkey = s.s_suppkey
    WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15-shaped: the supplier(s) with maximum half-year revenue. The
    scalar MAX is a 1-row broadcast joined back — the view-plus-max shape
    without a second scan of lineitem. Exact-decimal revenue makes the
    equality safe."""
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    rev = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(dsum(_rev(), "total_rev"))
    )
    mx = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
    )


@register(
    "q16_supplier_part_variety",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#5' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 14, 23, 45)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def q16_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16-shaped: distinct-supplier counts per (brand, type, size),
    excluding one brand, one type, and blacklisted (negative-balance)
    suppliers. The NOT IN is a broadcast left-anti join; countDistinct
    expands to a two-phase distinct aggregate (no driver-side set)."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    s = table(spark, sf_dir, "supplier")
    bad = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    pf = p.filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 14, 23, 45)
    )
    return (
        l.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(pf), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle=f"""
    WITH pa AS (
      SELECT l_partkey, {sql_davg('l_quantity', 'avg_qty')}
      FROM lineitem GROUP BY 1
    )
    SELECT round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,6)))
                 AS DOUBLE) / 7.0, 6) AS avg_yearly,
           count(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#3'
    JOIN pa ON pa.l_partkey = l.l_partkey
    WHERE l.l_quantity < 0.5 * pa.avg_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17-shaped: revenue impact of small-quantity Brand#3 lines (below
    half the part's average quantity). The correlated per-part average is
    one partkey-shuffled aggregate joined back to the fact — Catalyst's
    rewrite of the correlated scalar subquery, written directly. Rounded
    6dp averages make the threshold compare deterministic."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    pa = l.groupBy("l_partkey").agg(davg(F.col("l_quantity"), "avg_qty"))
    pa = pa.select(F.col("l_partkey").alias("pa_partkey"), "avg_qty")
    return (
        l.join(
            F.broadcast(p.filter(F.col("p_brand") == "Brand#3")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(pa, F.col("pa_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double")
                / 7.0,
                6,
            ).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q19_disjunctive_predicates",
    oracle=f"""
    SELECT {sql_dsum(_REV.replace('l_', 'l.l_'), 'revenue')},
           count(*) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 20 AND 45
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19-shaped: revenue under a three-branch brand/size/quantity
    disjunction. The brand∈{…} implication of the OR is derivable, so the
    broadcast build side still prunes part; the residual disjunction
    evaluates post-join in codegen."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#4")
            & F.col("p_size").between(20, 45)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(dsum(_rev(), "revenue"), F.count("*").alias("n_items"))
    )


@register(
    "q20_excess_stock_suppliers",
    oracle=f"""
    WITH sq AS (
      SELECT l.l_suppkey, {sql_dsum('l.l_quantity', 'total_qty')}
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_type = 'SMALL'
      GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, n.n_name, sq.total_qty
    FROM sq
    JOIN supplier s ON s.s_suppkey = sq.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE sq.total_qty > 1.5 * (
      SELECT {sql_davg('total_qty', 'a')} FROM sq)
    """,
)
def q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20-shaped (availqty := shipped quantity): suppliers who moved more
    than 1.5× the average volume of SMALL-type parts. Part prunes before
    broadcasting; the average threshold is a 1-row broadcast — the
    semi-join chain of the original becomes aggregate → threshold →
    dim joins."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    sq = (
        l.join(
            F.broadcast(p.filter(F.col("p_type") == "SMALL")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy("l_suppkey")
        .agg(dsum(F.col("l_quantity"), "total_qty"))
    )
    thr = sq.agg(davg(F.col("total_qty"), "a"))
    return (
        sq.crossJoin(F.broadcast(thr))
        .filter(F.col("total_qty") > 1.5 * F.col("a"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_suppkey", "s_name", "n_name", "total_qty")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    WITH flags AS (
      SELECT l.l_orderkey, l.l_suppkey,
             max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                 THEN 1 ELSE 0 END) AS is_late
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
                   AND o.o_orderstatus = 'F'
      GROUP BY 1, 2
    ), per_order AS (
      SELECT l_orderkey, count(*) AS n_supp, sum(is_late) AS n_late
      FROM flags GROUP BY 1
    )
    SELECT s.s_name, count(*) AS numwait
    FROM flags f
    JOIN per_order po ON po.l_orderkey = f.l_orderkey
                     AND po.n_supp >= 2 AND po.n_late = 1
    JOIN supplier s ON s.s_suppkey = f.l_suppkey
    WHERE f.is_late = 1
    GROUP BY 1
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21-shaped: suppliers who were the SOLE late shipper (>60 days after
    order date) on finished multi-supplier orders. The EXISTS/NOT-EXISTS
    pair of the original is two aggregations over one orderkey shuffle —
    per-(order,supplier) lateness flags, then per-order counts joined
    back. Top-100 via TakeOrderedAndProject."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    s = table(spark, sf_dir, "supplier")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    flags = (
        l.join(
            o.filter(F.col("o_orderstatus") == "F"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(F.when(late, 1).otherwise(0)).alias("is_late"))
    )
    per_order = flags.groupBy(F.col("l_orderkey").alias("po_orderkey")).agg(
        F.count("*").alias("n_supp"), F.sum("is_late").alias("n_late")
    )
    return (
        flags.filter(F.col("is_late") == 1)
        .join(
            per_order.filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1)),
            F.col("po_orderkey") == F.col("l_orderkey"),
        )
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


@register(
    "q22_idle_rich_customers",
    oracle=f"""
    WITH thr AS (
      SELECT {sql_davg('c_acctbal', 'avg_bal')}
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_nationkey, count(*) AS numcust,
           {sql_dsum('c.c_acctbal', 'totacctbal')}
    FROM customer c
    WHERE c.c_acctbal > (SELECT avg_bal FROM thr)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY 1
    """,
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22-shaped: customers with above-average positive balances and no
    orders at all, counted per nation. Scalar-average threshold broadcast;
    the NOT EXISTS is a left-anti join shuffling customer against the
    orders custkey projection (at scale: the anti side only carries
    custkey — column pruning keeps the shuffle narrow)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    thr = c.filter(F.col("c_acctbal") > 0).agg(davg(F.col("c_acctbal"), "avg_bal"))
    return (
        c.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            o.select("o_custkey"), F.col("o_custkey") == F.col("c_custkey"), "left_anti"
        )
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("numcust"), dsum(F.col("c_acctbal"), "totacctbal"))
    )
