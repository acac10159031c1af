"""Second-wave corpus operators (engine extension, SURVEY.md §2.8):
exact-substring duplicate-span coverage (the ExactSubstr signal of
Lee et al. 2022, "Deduplicating Training Data Makes Language Models
Better"), iterative BPE merge training, and greedy sequence packing.

The reference (`/root/reference/src/main.rs`) has no text surface at
all — these extend the declared LLM-pipeline mandate. Tokenization is
the registry-wide space-split convention so DuckDB oracles stay
engine-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from csv2parquet_spark.operators.text import shingles
from csv2parquet_spark.queries.registry import register
from csv2parquet_spark.tables import table

_K = 8  # duplicated-window width in tokens

_SQL_SHINGLE8 = " || ' ' || ".join(f"t[i+{j}]" if j else "t[i]" for j in range(_K))


@register(
    "exact_substr_dup_spans",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), win AS (
      SELECT doc_id, i, md5({_SQL_SHINGLE8}) AS h
      FROM toks, LATERAL (SELECT unnest(range(1, len(t) - {_K - 2})) AS i)
    ), dup AS (
      SELECT h FROM win GROUP BY h HAVING count(DISTINCT doc_id) >= 2
    ), d AS (
      SELECT w.doc_id, w.i FROM win w JOIN dup USING (h)
    ), brks AS (
      SELECT doc_id, i,
             CASE WHEN lag(i) OVER (PARTITION BY doc_id ORDER BY i) IS NULL
                    OR i > lag(i) OVER (PARTITION BY doc_id ORDER BY i) + {_K - 1}
                  THEN 1 ELSE 0 END AS brk
      FROM d
    ), grps AS (
      SELECT doc_id, i,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS UNBOUNDED PRECEDING) AS grp
      FROM brks
    ), spans AS (
      SELECT doc_id, grp, max(i) - min(i) + {_K} AS span_len
      FROM grps GROUP BY doc_id, grp
    ), agg AS (
      SELECT doc_id, CAST(sum(span_len) AS BIGINT) AS dup_tokens,
             count(*) AS n_spans
      FROM spans GROUP BY doc_id
    )
    SELECT a.doc_id, len(t.t) AS n_tokens, a.dup_tokens, a.n_spans,
           round(a.dup_tokens / len(t.t), 6) AS dup_frac
    FROM agg a JOIN toks t USING (doc_id)
    """,
)
def exact_substr_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr duplicate coverage (Lee et al. 2022): for every doc,
    the fraction of tokens covered by an 8-token window that also
    appears verbatim in ANOTHER document, with overlapping windows
    merged into maximal spans (gaps-and-islands).

    Scale shape: the window build is map-only (O(n) zip_with shingles);
    the duplicated-window set is a partial-aggregated groupBy on
    16-byte md5 keys; the join back is keyed on the same hash (never on
    text); the span merge is a per-document window — state bounded by
    one document's positions. No all-pairs stage anywhere, which is
    exactly how ExactSubstr's suffix-array semantics relax into a
    relational plan (window granularity instead of arbitrary length).
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("t"))
    win = (
        toks.select(
            "doc_id", F.posexplode(shingles(F.col("t"), k=_K)).alias("pos", "sh")
        )
        .select("doc_id", (F.col("pos") + 1).alias("i"), F.md5("sh").alias("h"))
    )
    dup = (
        win.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    dd = win.join(dup, "h").select("doc_id", "i")
    w = Window.partitionBy("doc_id").orderBy("i")
    prev = F.lag("i").over(w)
    brks = dd.withColumn(
        "brk",
        F.when(prev.isNull() | (F.col("i") > prev + (_K - 1)), F.lit(1)).otherwise(
            F.lit(0)
        ),
    )
    grps = brks.withColumn(
        "grp",
        F.sum("brk").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    spans = grps.groupBy("doc_id", "grp").agg(
        (F.max("i") - F.min("i") + _K).alias("span_len")
    )
    agg = spans.groupBy("doc_id").agg(
        F.sum("span_len").alias("dup_tokens"), F.count("*").alias("n_spans")
    )
    ntok = toks.select("doc_id", F.size("t").alias("n_tokens"))
    return agg.join(ntok, "doc_id").select(
        "doc_id",
        "n_tokens",
        "dup_tokens",
        "n_spans",
        F.round(F.col("dup_tokens") / F.col("n_tokens"), 6).alias("dup_frac"),
    )
