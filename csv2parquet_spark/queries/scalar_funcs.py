"""Scalar function families (SURVEY.md §2.2 "Scalar functions"): string,
date/time, math, array, map, JSON — all Catalyst built-ins (JVM-side,
whole-stage-codegen'd; no Python in the hot path).

Oracle notes: only engine-deterministic functions appear in hashed
outputs — string ops, integer math, sqrt (IEEE-correctly-rounded),
date arithmetic. Transcendentals (ln/pow) are rounded to 4dp since libm
vs java.lang.Math may differ in the last ulp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from csv2parquet_spark.queries.helpers import sql_dsum
from csv2parquet_spark.queries.registry import register
from csv2parquet_spark.tables import table


@register(
    "string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           lower(p_brand) AS brand_lower,
           length(p_name) AS name_len,
           substring(p_name, 1, 8) AS name_prefix,
           p_brand || '-' || p_type AS brand_type,
           replace(p_name, ' ', '_') AS name_snake,
           len(string_split(p_name, ' ')) AS n_words,
           regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowels,
           CASE WHEN contains(p_type, 'BRASS') THEN 1 ELSE 0 END AS is_brass,
           trim(' ' || p_brand || ' ') AS brand_trim
    FROM part
    """,
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: case, length, substring, concat, regexp, trim.

    NULL contract (r11): ``brand_type`` uses NULL-propagating concat on
    both sides (the oracle's ``concat``) — Spark's ``concat_ws`` would
    silently SKIP a NULL brand/type where SQL concat nulls the result
    (null-vs-empty-str audit class)."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat("p_brand", F.lit("-"), "p_type").alias("brand_type"),
        F.regexp_replace(F.col("p_name"), " ", "_").alias("name_snake"),
        F.size(F.split("p_name", " ")).alias("n_words"),
        F.regexp_replace(F.col("p_name"), "[aeiou]", "").alias("name_novowels"),
        F.when(F.col("p_type").contains("BRASS"), 1).otherwise(0).alias("is_brass"),
        F.trim(F.concat(F.lit(" "), F.col("p_brand"), F.lit(" "))).alias("brand_trim"),
    )


@register(
    "date_funcs",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS yr,
           month(o_orderdate) AS mth,
           day(o_orderdate) AS dom,
           quarter(o_orderdate) AS qtr,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch_start,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
           epoch_ms(o_orderdate) AS order_ms
    FROM orders
    """,
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date family: year/month/day, trunc, datediff, add, format."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mth"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("qtr"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .alias("days_since_epoch_start"),
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd")
        .alias("due_date"),
        F.unix_millis("o_orderdate").alias("order_ms"),
    )


@register(
    "math_funcs",
    oracle="""
    SELECT p_partkey,
           abs(p_size - 25) AS size_dev,
           CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
           CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
           sqrt(CAST(p_size AS DOUBLE)) AS size_sqrt,
           round(ln(p_retailprice), 4) AS price_ln,
           p_size % 7 AS size_mod,
           CAST(p_size AS DOUBLE) / 2 AS half_size,
           greatest(p_size, 10) AS size_floor10,
           least(p_size, 40) AS size_cap40
    FROM part
    """,
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family: round/abs/floor/ceil/sqrt/log with stabilized rounding."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.abs(F.col("p_size") - 25).alias("size_dev"),
        F.floor("p_retailprice").alias("price_floor"),
        F.ceil("p_retailprice").alias("price_ceil"),
        F.sqrt(F.col("p_size").cast("double")).alias("size_sqrt"),
        F.round(F.log(F.col("p_retailprice")), 4).alias("price_ln"),
        (F.col("p_size") % 7).alias("size_mod"),
        (F.col("p_size").cast("double") / 2).alias("half_size"),
        F.greatest(F.col("p_size"), F.lit(10)).alias("size_floor10"),
        F.least(F.col("p_size"), F.lit(40)).alias("size_cap40"),
    )


@register(
    "array_funcs",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           round(CAST(embedding[1] AS DOUBLE), 6) AS first_elem,
           round(CAST(list_sum(embedding) AS DOUBLE), 5) AS vec_sum,
           round(CAST(list_max(embedding) AS DOUBLE), 6) AS vec_max,
           round(CAST(list_min(embedding) AS DOUBLE), 6) AS vec_min
    FROM embeddings
    """,
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family: size/contains/element_at/transform/filter/aggregate."""
    e = table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_elem"),
        F.round(
            F.aggregate(
                "embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double")
            ),
            5,
        ).alias("vec_sum"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("vec_max"),
        F.round(F.array_min("embedding").cast("double"), 6).alias("vec_min"),
    )


@register(
    "array_transform_filter",
    oracle="""
    SELECT vec_id,
           len(list_filter(embedding, x -> x > 0)) AS n_positive,
           round(CAST(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS DOUBLE), 5)
               AS sum_sq
    FROM embeddings
    """,
)
def array_transform_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions: transform / filter / aggregate."""
    e = table(spark, sf_dir, "embeddings")
    x2 = F.transform("embedding", lambda x: x.cast("double") * x.cast("double"))
    return e.select(
        "vec_id",
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
        F.round(
            F.aggregate(x2, F.lit(0.0), lambda acc, v: acc + v), 5
        ).alias("sum_sq"),
    )


@register(
    "json_funcs",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
               AS sum_k,
           min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family: get_json_object / from_json over events.props."""
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@register(
    "map_funcs",
    oracle="""
    SELECT event_id,
           CASE WHEN props IS NOT NULL THEN 'k' END AS first_key,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
           CASE WHEN props IS NOT NULL THEN 1 END AS map_size
    FROM events
    """,
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map functions: build a map from parsed JSON, then read it back via
    map_keys / element_at / size. DuckDB oracle produces the same values
    without a map type (the hash checks values, not construction).

    NULL contract (r11): an absent props map has no first key and no
    size — the oracle's constants are CASE-gated on ``props IS NOT
    NULL`` to match Spark's NULL map semantics (size(NULL map) is NULL
    under the non-legacy default)."""
    e = table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return e.select(
        "event_id",
        F.element_at(F.map_keys(m), 1).alias("first_key"),
        F.element_at(m, "k").alias("k_value"),
        F.size(m).alias("map_size"),
    )


@register(
    "conditional_funcs",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 100000 THEN 'big'
                WHEN o_totalprice > 50000 THEN 'mid'
                ELSE 'small' END AS price_class,
           coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_norm,
           CASE WHEN o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%'
                THEN 1 ELSE 0 END AS is_urgent
    FROM orders
    """,
)
def conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditionals: CASE/when, coalesce, nullif, least/greatest."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 100000, "big")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("small")
        .alias("price_class"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("P")), F.lit("PENDING")).alias(
            "status_norm"
        ),
        F.when(
            F.col("o_orderpriority").like("1%") | F.col("o_orderpriority").like("2%"), 1
        )
        .otherwise(0)
        .alias("is_urgent"),
    )


@register(
    "string_funcs2",
    oracle="""
    SELECT p_partkey,
           lpad(p_brand, 12, '*') AS brand_padded,
           rpad(p_brand, 12, '.') AS brand_rpadded,
           reverse(p_name) AS name_rev,
           repeat(p_brand, 2) AS brand_twice,
           translate(p_type, 'AEIOU', 'aeiou') AS type_lowvowels,
           strpos(p_name, ' ') AS first_space,
           to_base64(encode(p_brand)) AS brand_b64,
           hex(p_partkey) AS key_hex,
           left(p_name, 4) AS name_left4,
           right(p_name, 4) AS name_right4
    FROM part
    """,
)
def string_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string batch: padding, reverse/repeat/translate, position,
    base64/hex encodings, left/right slicing."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lpad("p_brand", 12, "*").alias("brand_padded"),
        F.rpad("p_brand", 12, ".").alias("brand_rpadded"),
        F.reverse("p_name").alias("name_rev"),
        F.repeat("p_brand", 2).alias("brand_twice"),
        F.translate("p_type", "AEIOU", "aeiou").alias("type_lowvowels"),
        F.instr("p_name", " ").alias("first_space"),
        F.base64(F.encode("p_brand", "UTF-8")).alias("brand_b64"),
        F.upper(F.hex("p_partkey")).alias("key_hex"),
        F.substring("p_name", 1, 4).alias("name_left4"),
        F.substring(F.col("p_name"), -4, 4).alias("name_right4"),
    )


@register(
    "array_funcs2",
    oracle="""
    SELECT s_suppkey,
           array_to_string(list_sort(list_distinct(string_split(s_name, ' '))), '|')
               AS toks_sorted,
           array_to_string(list_reverse_sort(string_split(s_name, ' ')), '|')
               AS toks_desc,
           len(list_intersect(string_split(s_name, ' '),
                              ['Supplier', 'supplier'])) AS n_supplier_tok,
           array_to_string(flatten([string_split(s_name, ' '), ['#']]), '|')
               AS toks_flat,
           list_contains(string_split(s_name, ' '), 'Supplier') AS has_supplier
    FROM supplier
    WHERE s_name IS NOT NULL
    """,
)
def array_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second array batch: sort asc/desc, intersect, flatten, contains.

    Array-typed outputs are serialized with ``concat_ws`` — the driver's
    canonicalizer (pandas sort_values) cannot hash list cells, so every
    registry query must emit scalar columns only.

    NULL contract (r11): NULL names are excluded at the input on both
    sides — the NULL-array behaviors of the exercised functions are
    engine-specific (Spark flatten propagates a NULL element where
    DuckDB skips it; concat_ws('' ) vs array_to_string(NULL)), so the
    function-family exercise is defined over non-NULL input.
    """
    s = table(spark, sf_dir, "supplier").filter(F.col("s_name").isNotNull())
    toks = F.split("s_name", " ")
    return s.select(
        "s_suppkey",
        F.concat_ws("|", F.array_sort(F.array_distinct(toks))).alias("toks_sorted"),
        F.concat_ws("|", F.sort_array(toks, asc=False)).alias("toks_desc"),
        F.size(
            F.array_intersect(toks, F.array(F.lit("Supplier"), F.lit("supplier")))
        ).alias("n_supplier_tok"),
        F.concat_ws("|", F.flatten(F.array(toks, F.array(F.lit("#"))))).alias(
            "toks_flat"
        ),
        F.array_contains(toks, "Supplier").alias("has_supplier"),
    )


@register(
    "date_funcs2",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
           weekofyear(o_orderdate) AS wk,
           dayofweek(o_orderdate) AS dow,
           strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d') AS qtr_start,
           datepart('doy', o_orderdate) AS doy
    FROM orders
    """,
)
def date_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second date batch: add_months, last_day, ISO week, day-of-week,
    quarter truncation, day-of-year. (DuckDB dayofweek is 0=Sunday;
    Spark dayofweek is 1=Sunday — normalized to DuckDB's convention.)"""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format(F.add_months("o_orderdate", 3), "yyyy-MM-dd").alias("plus3m"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.weekofyear("o_orderdate").alias("wk"),
        (F.dayofweek("o_orderdate") - 1).alias("dow"),
        F.date_format(F.date_trunc("quarter", "o_orderdate"), "yyyy-MM-dd").alias(
            "qtr_start"
        ),
        F.dayofyear("o_orderdate").alias("doy"),
    )


@register(
    "variant_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k,
           CAST(json_extract(props, '$.k') AS INTEGER) % 10 AS k_mod,
           json_extract_string(props, '$.missing') AS missing
    FROM events
    """,
)
def variant_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT type (Spark 4): parse_json once into a
    binary variant, then typed try_variant_get extraction — the
    schema-on-read path that replaces repeated string re-parsing at
    scale. Missing paths yield NULL (try_ semantics), matching the
    oracle's json_extract."""
    from csv2parquet_spark.tables import table as _t

    e = _t(spark, sf_dir, "events")
    v = F.parse_json("props")
    return e.select(
        "event_id",
        F.try_variant_get(v, "$.k", "int").alias("k"),
        (F.try_variant_get(v, "$.k", "int") % 10).alias("k_mod"),
        F.try_variant_get(v, "$.missing", "string").alias("missing"),
    )


@register(
    "semi_structured_roundtrip",
    oracle="""
    SELECT n_nationkey, n_name AS xml_name, n_name AS csv_name,
           n_regionkey AS csv_region
    FROM nation
    """,
)
def semi_structured_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_xml / from_csv column functions: serialize row values into
    XML/CSV strings, parse them back, and extract — the oracle checks
    the round-trip is lossless (output equals the source values)."""
    from csv2parquet_spark.tables import table as _t

    n = _t(spark, sf_dir, "nation")
    xml = F.concat(F.lit("<r><name>"), F.col("n_name"), F.lit("</name></r>"))
    csvs = F.concat_ws(",", "n_name", "n_regionkey")
    return n.select(
        "n_nationkey",
        F.from_xml(xml, "name string")["name"].alias("xml_name"),
        F.from_csv(csvs, F.lit("a string, b bigint"))["a"].alias("csv_name"),
        F.from_csv(csvs, F.lit("a string, b bigint"))["b"].alias("csv_region"),
    )


@register(
    "sql_udf_scalar",
    oracle=f"""
    SELECT l_returnflag,
           count(*) AS n,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'net_revenue')},
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)',
                     'gross_revenue')}
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def sql_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar functions (Spark 4 ``CREATE TEMPORARY
    FUNCTION ... RETURNS ... RETURN expr`` — SQL UDFs): net and gross
    price as named reusable functions, used in an aggregate. Unlike
    Python UDFs these INLINE into Catalyst (the plan shows the
    expanded expression — whole-stage codegen, pushdown, no
    serialization boundary), which is why they are the first choice
    for shared business logic; the oracle states the expanded
    arithmetic directly.
    """
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION net_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1 - d)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION gross_price("
        "p DOUBLE, d DOUBLE, t DOUBLE) "
        "RETURNS DOUBLE RETURN net_price(p, d) * (1 + t)"
    )
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("li_sqludf")
    return spark.sql(
        """
        SELECT l_returnflag,
               count(*) AS n,
               CAST(sum(CAST(net_price(l_extendedprice, l_discount)
                             AS DECIMAL(18,6))) AS DOUBLE) AS net_revenue,
               CAST(sum(CAST(gross_price(l_extendedprice, l_discount, l_tax)
                             AS DECIMAL(18,6))) AS DOUBLE) AS gross_revenue
        FROM li_sqludf
        GROUP BY l_returnflag
        """
    )


@register(
    "try_funcs",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 7 = 0 THEN NULL
                ELSE round(CAST(o_totalprice AS DOUBLE)
                           / (o_orderkey % 7), 6) END AS safe_ratio,
           TRY_CAST(CASE WHEN o_orderkey % 3 = 0 THEN 'not-a-number'
                         ELSE CAST(o_orderkey AS VARCHAR) END
                    AS BIGINT) AS safe_parse,
           CASE WHEN o_orderpriority IS NULL THEN NULL
                WHEN (o_orderkey % 3) + 1 = 1
                  THEN split_part(o_orderpriority, '-', 1)
                WHEN (o_orderkey % 3) + 1 = 2
                  THEN split_part(o_orderpriority, '-', 2)
                ELSE NULL END AS safe_elem
    FROM orders
    WHERE o_orderkey < 500
    """,
)
def try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe ``try_*`` family: the error-absorbing twins that make
    ANSI mode (Spark 4's default) production-safe — a single malformed
    row NULLs out instead of failing a 100 TB job.

    * ``try_divide`` — division by (o_orderkey % 7) NULLs where the
      divisor is zero instead of raising DIVIDE_BY_ZERO;
    * ``try_to_number``-shaped parse via ``try_cast`` — every third key
      is planted as a non-numeric string and comes back NULL;
    * ``try_element_at`` — an out-of-range array index (3rd token of a
      2-token split) returns NULL instead of INVALID_ARRAY_INDEX.

    The oracle reproduces each with explicit CASE/TRY_CAST guards —
    the boilerplate try_* removes. All map-side expressions; the
    filter is pushed to the scan.

    NULL contract (r11): a NULL o_orderpriority yields a NULL
    safe_elem on both sides — DuckDB's ``split_part(NULL, ...)``
    returns '' (not NULL), so the oracle CASE-gates it explicitly to
    match Spark's NULL-propagating ``try_element_at(split(NULL))``.
    """
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    bad_str = F.when(
        F.col("o_orderkey") % 3 == 0, F.lit("not-a-number")
    ).otherwise(F.col("o_orderkey").cast("string"))
    return o.select(
        "o_orderkey",
        F.round(
            F.try_divide(
                F.col("o_totalprice").cast("double"),
                (F.col("o_orderkey") % 7).cast("double"),
            ),
            6,
        ).alias("safe_ratio"),
        F.try_to_number(bad_str, F.lit("999999999")).cast("long").alias(
            "safe_parse"
        ),
        F.try_element_at(
            F.split("o_orderpriority", "-"),
            ((F.col("o_orderkey") % 3) + 1).cast("int"),
        ).alias("safe_elem"),
    )


@register(
    "map_funcs2",
    oracle="""
    WITH m AS (
      SELECT event_id,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS kv,
             event_id % 10 AS v2
      FROM events
    )
    SELECT event_id,
           CASE WHEN kv >= 50 THEN 1 ELSE 0 END
             + CASE WHEN v2 >= 50 THEN 1 ELSE 0 END AS n_big,
           kv * 2 AS k_doubled,
           'K' AS first_upper_key,
           v2 + 2 AS v2_zipped,
           4 AS concat_size
    FROM m
    """,
)
def map_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order MAP functions — the second map batch:
    ``map_filter`` (entries surviving a value predicate),
    ``transform_values`` / ``transform_keys`` (lambda rewrites of
    values and keys), ``map_zip_with`` (keywise merge of two maps) and
    ``map_concat`` — the family that manipulates map columns entirely
    inside Catalyst (no explode→groupBy round trip, no UDF).

    The maps are built deterministically from props.k and event_id, so
    the DuckDB oracle reproduces every extracted result with plain
    arithmetic — the hash checks semantics (which entries survive,
    what the lambdas compute, how zip aligns keys), not map rendering.
    All map-side; zero exchanges.
    """
    e = table(spark, sf_dir, "events")
    kv = F.from_json("props", "map<string,bigint>")["k"]
    m1 = F.create_map(
        F.lit("k"), kv, F.lit("v2"), (F.col("event_id") % 10).cast("bigint")
    )
    m2 = F.create_map(
        F.lit("k"), F.lit(1).cast("bigint"),
        F.lit("v2"), F.lit(2).cast("bigint"),
    )
    zipped = F.map_zip_with(m1, m2, lambda k, a, b: a + b)
    return e.select(
        "event_id",
        F.size(F.map_filter(m1, lambda k, v: v >= 50)).alias("n_big"),
        F.element_at(F.transform_values(m1, lambda k, v: v * 2), "k").alias(
            "k_doubled"
        ),
        F.element_at(
            F.map_keys(F.transform_keys(m1, lambda k, v: F.upper(k))), 1
        ).alias("first_upper_key"),
        F.element_at(zipped, "v2").alias("v2_zipped"),
        F.size(
            F.map_concat(
                m1,
                F.create_map(
                    F.lit("x"), F.lit(0).cast("bigint"),
                    F.lit("y"), F.lit(0).cast("bigint"),
                ),
            )
        ).alias("concat_size"),
    )


@register(
    "variant_explode_props",
    oracle="""
    SELECT 'k' AS key,
           count(*) AS n_entries,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_int_values,
           CAST(sum(CASE WHEN CAST(json_extract_string(props, '$.k')
                              AS BIGINT) >= 50
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_big
    FROM events
    WHERE props IS NOT NULL
    """,
)
def variant_explode_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT lateral explode: ``parse_json`` the semi-
    structured props column into a variant, ``variant_explode`` it to
    (pos, key, value) rows, and extract typed values with a plain
    ``::bigint`` cast — the shredding step every semi-structured
    ingest pipeline runs, without committing to a schema up front
    (unknown keys would surface as new ``key`` groups instead of
    breaking a struct cast).

    The oracle re-derives the same rollup from JSON string functions.
    Map-side explode + one small-key partial agg.
    """
    ev = table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events_var")
    return spark.sql(
        """
        SELECT vt.key AS key,
               count(*) AS n_entries,
               CAST(sum(CAST(vt.value AS BIGINT)) AS BIGINT)
                 AS sum_int_values,
               CAST(sum(CASE WHEN CAST(vt.value AS BIGINT) >= 50
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_big
        FROM (SELECT parse_json(props) AS v FROM events_var) t,
             LATERAL variant_explode(t.v) vt
        GROUP BY vt.key
        """
    )


@register(
    "listagg_ordered",
    oracle="""
    SELECT n_regionkey AS region_key,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           count(*) AS n_nations
    FROM nation
    GROUP BY n_regionkey
    """,
)
def listagg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 ``LISTAGG ... WITHIN GROUP (ORDER BY ...)`` — the
    SQL-standard ordered string aggregation (DuckDB spells it
    ``string_agg(... ORDER BY ...)``). The explicit WITHIN GROUP order
    is what makes the result deterministic and hash-comparable —
    unordered collect_list/string_agg is partition-order-dependent and
    can never be oracle-checked.

    Dimension-sized group-by; the pattern matters at scale for
    building per-key delimited rollups (label lists, tag strings)
    without a nondeterministic collect.
    """
    table(spark, sf_dir, "nation").createOrReplaceTempView("nation_la")
    return spark.sql(
        """
        SELECT n_regionkey AS region_key,
               listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)
                 AS nations,
               count(*) AS n_nations
        FROM nation_la
        GROUP BY n_regionkey
        """
    )


@register(
    "xpath_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey % 10 + o_orderkey % 7 AS BIGINT) AS qty_sum,
           o_orderstatus AS status_text,
           2 AS n_items
    FROM orders
    WHERE o_orderkey < 300
    """,
)
def xpath_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XPath scalar family over per-row XML documents: ``xpath_long``
    with an XPath aggregate (sum over repeated nodes), ``xpath_string``
    scalar extraction, and node-set counting via ``size(xpath(...))`` —
    the lightweight sibling of the full from_xml/row-tag converter path
    for when XML is a COLUMN, not a file format.

    The documents are synthesized from order columns, so the oracle
    recomputes every extraction from the generating arithmetic — a
    parser that drops a node or mis-scopes the XPath breaks the hash.
    Map-side expressions; filter pushed to the scan.
    """
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    xml = F.concat(
        F.lit("<order><item><qty>"),
        (F.col("o_orderkey") % 10).cast("string"),
        F.lit("</qty></item><item><qty>"),
        (F.col("o_orderkey") % 7).cast("string"),
        F.lit("</qty></item><status>"),
        F.col("o_orderstatus"),
        F.lit("</status></order>"),
    )
    return o.select(
        "o_orderkey",
        F.xpath_long(xml, F.lit("sum(order/item/qty)")).alias("qty_sum"),
        F.xpath_string(xml, F.lit("order/status")).alias("status_text"),
        F.size(F.xpath(xml, F.lit("order/item/qty/text()"))).alias("n_items"),
    )
