"""Window-function surface + as-of join (SURVEY.md §2.2 "Window functions",
§2.2 "Joins → as-of").

All window specs carry a total order (ties broken by a unique key) so
results are deterministic across engines. Running sums use decimal
accumulation — window sums in DuckDB use segment trees, Spark uses running
buffers; decimal makes association order irrelevant.

Scale: every window here partitions by a high-cardinality key (custkey,
orderkey, user_id) — state per partition stays tiny, the shuffle is one
hash exchange on the partition key, and no window spans the whole dataset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from csv2parquet_spark.queries.helpers import DEC
from csv2parquet_spark.queries.registry import register
from csv2parquet_spark.tables import table


@register(
    "window_rank_orders",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER w AS rn,
             rank()       OVER w AS rnk,
             dense_rank() OVER w AS drnk
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    ) WHERE rn <= 3
    """,
)
def window_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: row_number / rank / dense_rank."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_lag_lead_order_gaps",
    oracle="""
    SELECT o_custkey, o_orderkey,
           epoch_ms(o_orderdate) AS order_ms,
           epoch_ms(lag(o_orderdate)  OVER w) AS prev_ms,
           epoch_ms(lead(o_orderdate) OVER w) AS next_ms
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate NULLS LAST, o_orderkey)
    """,
)
def window_lag_lead_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over per-customer order history: gap-to-previous days.

    NULL contract (r11): orders with NULL o_orderdate sort LAST,
    explicitly on both sides — Spark defaults ASC to NULLS FIRST,
    DuckDB to NULLS LAST, so an implicit ordering diverges the moment
    a date is missing (NULL-twin audit class null-sort-order)."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.asc_nulls_last("o_orderdate"), "o_orderkey"
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.unix_millis("o_orderdate").alias("order_ms"),
        F.unix_millis(F.lag("o_orderdate").over(w)).alias("prev_ms"),
        F.unix_millis(F.lead("o_orderdate").over(w)).alias("next_ms"),
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,6)))
                OVER (PARTITION BY l_orderkey
                      ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity,
                               l_extendedprice
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_qty
    FROM lineitem
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running decimal sum per order (rows-frame cumulative window)."""
    # l_linenumber alone is not unique per order in the synthetic data —
    # extend the ORDER BY until the order is total (same on both sides).
    l = table(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_partkey", "l_suppkey", "l_quantity",
                 "l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.sum(F.col("l_quantity").cast(DEC)).over(w).cast("double").alias("running_qty"),
    )


def window_ntile_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-order window: fine at test scale; at 100 TB this is the one
    window shape to avoid (single-partition sort) — documented tradeoff.

    DELIBERATELY UNREGISTERED (round 4): the driver contract should hold
    only plans that survive 100× — this is the teaching twin of
    ``window_ntile_scalable`` (identical output, registered, scale-safe);
    tests/test_operators.py pins their equivalence."""
    o = table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "window_ntile_scalable",
    oracle="""
    SELECT o_orderkey,
           ntile(4) OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume
    FROM orders
    WINDOW w AS (ORDER BY o_totalprice NULLS LAST, o_orderkey)
    """,
)
def window_ntile_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-safe twin of ``window_ntile_percentiles``: same ntile(4) /
    percent_rank / cume_dist result, but via the two-pass plan
    (range-partitioned parallel sort → per-partition counts → broadcast
    offsets → map-only local enumeration; operators/ranking.py) instead
    of a single-partition global Window — no stage ever holds the whole
    dataset. test_plans.py asserts the plan has no Window and no
    SinglePartition exchange."""
    from csv2parquet_spark.operators.ranking import rank_stats

    o = table(spark, sf_dir, "orders")
    # NULL contract (r11): NULL prices rank LAST, explicit on both
    # sides (rank_stats threads the sort-order through the range
    # exchange; Spark's default would be NULLS FIRST, DuckDB's LAST).
    return rank_stats(
        o, [F.asc_nulls_last("o_totalprice"), "o_orderkey"], tiles=4
    ).select("o_orderkey", "quartile", "pct_rank", "cume")


@register(
    "window_first_last_nth",
    oracle="""
    SELECT o_custkey, o_orderkey,
           first_value(o_totalprice IGNORE NULLS) OVER w AS cheapest,
           last_value(o_totalprice IGNORE NULLS)  OVER w AS priciest,
           nth_value(o_totalprice, 2 IGNORE NULLS) OVER w AS second_cheapest
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_totalprice NULLS LAST, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value over a full-partition frame (the frame must
    be explicit: the SQL default frame stops at CURRENT ROW, which makes
    last_value just the current row).

    NULL contract (r11): value picks IGNORE NULLS on both sides — a
    NULL price is never 'cheapest'/'priciest'/'second cheapest'; the
    non-NULL subsequence keeps its relative order under any NULL
    placement, and the ordering is pinned NULLS LAST explicitly for
    good measure (null-sort-order burn-down)."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc_nulls_last("o_totalprice"), "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice", ignorenulls=True).over(w).alias("cheapest"),
        F.last("o_totalprice", ignorenulls=True).over(w).alias("priciest"),
        F.nth_value("o_totalprice", 2, ignoreNulls=True)
        .over(w)
        .alias("second_cheapest"),
    )


@register(
    "window_moving_7day_revenue",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS dd,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS day_rev
      FROM orders GROUP BY 1
    )
    SELECT strftime(dd, '%Y-%m-%d') AS d, day_rev,
           CAST(sum(CAST(day_rev AS DECIMAL(18,6))) OVER (
             ORDER BY dd RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS rev_7d
    FROM daily
    """,
)
def window_moving_7day_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-frame moving aggregate: daily revenue and its trailing
    7-day sum. The range frame is over epoch-day ints (portable across
    engines); the pre-aggregation to one row per day keeps the ordered
    window tiny (days, not orders) — the shape that survives scale."""
    o = table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("day_rev"))
    )
    w = (
        Window.orderBy(F.unix_date("d"))
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        F.date_format("d", "yyyy-MM-dd").alias("d"),
        "day_rev",
        F.sum(F.col("day_rev").cast(DEC)).over(w).cast("double").alias("rev_7d"),
    )


@register(
    "asof_purchase_prev_click",
    oracle="""
    SELECT p.event_id, p.user_id,
           epoch_ms(p.ts) AS purchase_ms,
           (SELECT epoch_ms(max(c.ts)) FROM events c
            WHERE c.user_id = p.user_id AND c.event_type = 'click'
              AND c.ts < p.ts) AS prev_click_ms
    FROM events p
    WHERE p.event_type = 'purchase'
    """,
)
def asof_purchase_prev_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (SURVEY §2.2): each purchase matched to the latest
    strictly-earlier click by the same user.

    Spark has no native as-of join; implemented as the union+window
    pattern — one shuffle on user_id, a range-frame max over epoch
    millis, then filter back to purchases. Scales as a single window
    (no per-row subquery, no pandas): state per user is O(1).

    NULL contract (r11): a NULL join key never matches — SQL equality
    semantics, which the oracle's correlated subquery gets for free
    but ``partitionBy`` does NOT (Spark windows lump NULL keys into
    one pseudo-partition, so a NULL-user purchase would see NULL-user
    clicks). The explicit ``user_id IS NOT NULL`` gate restores the
    SQL contract. A NULL event time is gated explicitly too: Spark
    range frames anchored on a NULL ordering value are asymmetric
    (empty BACKWARD frame, but the FORWARD frame sees every non-NULL
    row because NULLs sort first) — the gate pins `ts < NULL` / `ts >
    NULL` = no match on both directions rather than relying on that
    incidental emptiness.
    """
    e = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    e = e.withColumn("ts_ms", F.unix_millis("ts"))
    click_ms = F.when(F.col("event_type") == "click", F.col("ts_ms"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    prev = F.when(
        F.col("user_id").isNotNull() & F.col("ts_ms").isNotNull(),
        F.max(click_ms).over(w),
    )
    return (
        e.withColumn("prev_click_ms", prev)
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.col("ts_ms").alias("purchase_ms"),
            "prev_click_ms",
        )
    )


@register(
    "asof_purchase_nearest_click",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, epoch_ms(ts) AS purchase_ms, ts
      FROM events WHERE event_type = 'purchase'
    ), x AS (
      SELECT p.event_id, p.user_id, p.purchase_ms,
        (SELECT epoch_ms(max(c.ts)) FROM events c
         WHERE c.user_id = p.user_id AND c.event_type = 'click'
           AND c.ts < p.ts) AS prev_click_ms,
        (SELECT epoch_ms(min(c.ts)) FROM events c
         WHERE c.user_id = p.user_id AND c.event_type = 'click'
           AND c.ts > p.ts) AS next_click_ms
      FROM p
    )
    SELECT event_id, user_id, purchase_ms, prev_click_ms, next_click_ms,
      CASE WHEN prev_click_ms IS NULL THEN next_click_ms
           WHEN next_click_ms IS NULL THEN prev_click_ms
           WHEN purchase_ms - prev_click_ms <= next_click_ms - purchase_ms
             THEN prev_click_ms
           ELSE next_click_ms END AS nearest_click_ms
    FROM x
    """,
)
def asof_purchase_nearest_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, FORWARD and NEAREST directions (completing the
    pandas merge_asof direction family — backward lives in
    asof_purchase_prev_click): each purchase gets the latest earlier
    click, the earliest later click, and the nearer of the two (ties
    prefer the earlier click, pandas convention).

    Same scale shape as backward: both directions come from one
    union+window pass — a single user_id shuffle; the two range frames
    share the window's partitioning and sort, so the forward direction
    is free once the backward one is paid. No per-row subquery, no
    pandas; state per user is O(1).

    NULL contract (r11): same as the backward twin — a NULL user_id
    or NULL purchase time never matches (explicit gate mirroring SQL
    equality/comparison; Spark's partitionBy would otherwise pair
    NULL-user purchases with NULL-user clicks, and the FORWARD range
    frame anchored on a NULL ts sees every non-NULL row because NULLs
    sort first)."""
    e = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    e = e.withColumn("ts_ms", F.unix_millis("ts"))
    click_ms = F.when(F.col("event_type") == "click", F.col("ts_ms"))
    base = Window.partitionBy("user_id").orderBy("ts_ms")
    w_prev = base.rangeBetween(Window.unboundedPreceding, -1)
    w_next = base.rangeBetween(1, Window.unboundedFollowing)
    keyed = F.col("user_id").isNotNull() & F.col("ts_ms").isNotNull()
    prev_c, next_c = F.col("prev_click_ms"), F.col("next_click_ms")
    nearest = (
        F.when(prev_c.isNull(), next_c)
        .when(next_c.isNull(), prev_c)
        .when(F.col("purchase_ms") - prev_c <= next_c - F.col("purchase_ms"), prev_c)
        .otherwise(next_c)
    )
    return (
        e.withColumn("prev_click_ms", F.when(keyed, F.max(click_ms).over(w_prev)))
        .withColumn("next_click_ms", F.when(keyed, F.min(click_ms).over(w_next)))
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.col("ts_ms").alias("purchase_ms"),
            "prev_click_ms",
            "next_click_ms",
        )
        .withColumn("nearest_click_ms", nearest)
    )


@register(
    "asof_cogroup_merge",
    oracle="""
    SELECT p.event_id, p.user_id,
           epoch_ms(p.ts) AS purchase_ms,
           (SELECT epoch_ms(max(c.ts)) FROM events c
            WHERE c.user_id = p.user_id AND c.event_type = 'click'
              AND c.ts < p.ts) AS prev_click_ms
    FROM events p
    WHERE p.event_type = 'purchase'
    """,
)
def asof_cogroup_merge(
    spark: SparkSession, sf_dir: str, on_null: str = "raise"
) -> DataFrame:
    """The SAME as-of join as ``asof_purchase_prev_click``, through the
    one pandas-UDF shape the engine hadn't exercised: cogrouped
    ``applyInPandas`` — purchases and clicks grouped by user on both
    sides, each pair of per-user frames merged with pandas
    ``merge_asof`` (backward, strict) inside the task.

    Same shuffle topology as the union+window original (one user_id
    exchange per side), but state is the user's whole click frame in
    pandas rather than the window's O(1) running max — the Catalyst
    original remains the production path; this twin exists to pin the
    cogroup API and to hash-prove UDF/engine agreement on identical
    semantics (both share one oracle).
    """
    import pandas as pd

    from csv2parquet_spark.operators.null_policy import check_on_null, skip_nulls

    check_on_null(on_null)
    e = table(spark, sf_dir, "events")
    if on_null == "skip":
        # A NULL-ts event has no place on either side of an as-of merge;
        # drop-with-count instead of aborting the whole job.
        e = skip_nulls(e, ["ts"], "asof_cogroup_merge")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", F.unix_millis("ts").alias("purchase_ms")
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.unix_millis("ts").alias("click_ms")
    )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0:
            return pd.DataFrame(
                columns=["event_id", "user_id", "purchase_ms", "prev_click_ms"]
            )
        if left["purchase_ms"].isna().any() or right["click_ms"].isna().any():
            # NULL ts rows arrive as NaN and flip the pandas merge key
            # to float64 — merge_asof then dies with an opaque
            # 'incompatible merge keys' (r9 NULL-twin audit). Reject
            # with the contract instead.
            raise ValueError(
                "asof_cogroup_merge: NULL event timestamps in the "
                "input — filter them first "
                "(df.filter(F.col('ts').isNotNull()))"
            )
        left = left.sort_values("purchase_ms", kind="mergesort")
        out = left.rename(columns={"purchase_ms": "ts"})
        right = right.sort_values("click_ms", kind="mergesort")
        lookup = pd.DataFrame(
            {"ts": right["click_ms"], "prev_click_ms": right["click_ms"]}
        )
        m = pd.merge_asof(
            out, lookup, on="ts", direction="backward", allow_exact_matches=False
        )
        return pd.DataFrame(
            {
                "event_id": m["event_id"],
                "user_id": m["user_id"],
                "purchase_ms": m["ts"],
                "prev_click_ms": m["prev_click_ms"].astype("Int64"),
            }
        )

    return (
        purchases.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInPandas(
            merge,
            "event_id long, user_id long, purchase_ms long, prev_click_ms long",
        )
    )
