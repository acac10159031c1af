"""Corpus-hygiene queries (training-data pipeline surface beyond
SURVEY.md §2.8's first wave): benchmark decontamination, C4-style
quality filtering, Gopher repetition signals, boilerplate n-gram
mining, and deterministic mixture sampling.

Every query has a full DuckDB oracle — the hash keys are md5 (not
xxhash64) and the sampling gate is multiplicative-arithmetic (not an
RNG) precisely so both engines can reproduce the values bit-for-bit;
the operators' docstrings name the at-scale substitutions
(operators/pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from csv2parquet_spark.operators import pipeline as P
from csv2parquet_spark.operators.scan import parallelize_scan as _pscan
from csv2parquet_spark.queries.registry import register
from csv2parquet_spark.tables import table

_EVAL_SOURCES = ("src0", "src1")

_SQL_SHINGLE5 = (
    "t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]"
)
_SQL_STOP_IN = "('" + "', '".join(P.STOPWORDS) + "')"


@register(
    "decontam_train_vs_eval",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, source, md5({_SQL_SHINGLE5}) AS h
      FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 3)) AS i)
    ), ev AS (
      SELECT DISTINCT h FROM sh WHERE source IN ('src0', 'src1')
    )
    SELECT s.doc_id, count(DISTINCT s.h) AS n_shared
    FROM sh s JOIN ev USING (h)
    WHERE s.source NOT IN ('src0', 'src1')
    GROUP BY s.doc_id
    """,
)
def decontam_train_vs_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: treating sources src0/src1 as the
    held-out eval suite, find train documents sharing any 5-token
    shingle with it. Eval keys are broadcast — the corpus is never
    shuffled (operators/pipeline.py:decontaminate)."""
    docs = table(spark, sf_dir, "documents")
    ev = docs.filter(F.col("source").isin(*_EVAL_SOURCES))
    tr = docs.filter(~F.col("source").isin(*_EVAL_SOURCES))
    return P.decontaminate(tr, ev, k=5)


@register(
    "quality_filter_c4",
    oracle=f"""
    WITH s AS (
      SELECT source, len(t) AS n,
             (length(text) - len(t) + 1) * 1.0 / len(t) AS avg_len,
             len(list_filter(t, x -> x IN {_SQL_STOP_IN})) AS nstop,
             len(t) - 1 AS n2,
             (SELECT count(DISTINCT t[i] || ' ' || t[i+1])
              FROM (SELECT unnest(range(1, len(t))) AS i)) AS nd2
      FROM (SELECT source, text, string_split(text, ' ') AS t FROM documents)
    ), r AS (
      SELECT source,
             n >= 20 AS pass_min_words,
             avg_len >= 3 AND avg_len <= 10 AS pass_word_len,
             nstop * 1.0 / n >= 0.01 AS pass_stopword,
             CASE WHEN n2 > 0 THEN (n2 - nd2) * 1.0 / n2 ELSE 0.0 END <= 0.10
               AS pass_repetition
      FROM s
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN pass_min_words AND pass_word_len
                          AND pass_stopword AND pass_repetition
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
           CAST(sum(CASE WHEN pass_min_words THEN 0 ELSE 1 END) AS BIGINT)
             AS fail_min_words,
           CAST(sum(CASE WHEN pass_word_len THEN 0 ELSE 1 END) AS BIGINT)
             AS fail_word_len,
           CAST(sum(CASE WHEN pass_stopword THEN 0 ELSE 1 END) AS BIGINT)
             AS fail_stopword,
           CAST(sum(CASE WHEN pass_repetition THEN 0 ELSE 1 END) AS BIGINT)
             AS fail_repetition
    FROM r GROUP BY source
    """,
)
def quality_filter_c4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style quality gate, summarized per source: total docs, docs
    passing all rules, and per-rule failure counts. Map-only rule
    evaluation (operators/pipeline.py:quality_columns) + one small
    per-source aggregate."""
    q = P.quality_columns(table(spark, sf_dir, "documents"))

    def fails(col: str):
        return F.sum(F.when(F.col(col), 0).otherwise(1))

    return q.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_keep"),
        fails("pass_min_words").alias("fail_min_words"),
        fails("pass_word_len").alias("fail_word_len"),
        fails("pass_stopword").alias("fail_stopword"),
        fails("pass_repetition").alias("fail_repetition"),
    )


@register(
    "repetition_stats",
    oracle="""
    WITH g AS (
      SELECT doc_id, t[i] || ' ' || t[i+1] AS g
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
           LATERAL (SELECT unnest(range(1, len(t))) AS i)
    ), per AS (
      SELECT doc_id, g, count(*) AS c FROM g GROUP BY 1, 2
    )
    SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_2grams,
           round((sum(c) - count(*)) * 1.0 / sum(c), 6) AS dup2_frac,
           round(max(c) * 1.0 / sum(c), 6) AS top2_frac
    FROM per GROUP BY doc_id
    """,
)
def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style per-document repetition signals
    (operators/pipeline.py:repetition_stats)."""
    return P.repetition_stats(table(spark, sf_dir, "documents"))


@register(
    "boilerplate_ngrams_top",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, {_SQL_SHINGLE5} AS shingle
      FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 3)) AS i)
    )
    SELECT shingle, CAST(count(*) AS BIGINT) AS n_docs
    FROM sh GROUP BY shingle HAVING count(*) >= 3
    ORDER BY n_docs DESC, shingle LIMIT 50
    """,
)
def boilerplate_ngrams_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate 5-gram mining: shingles present in ≥3 distinct
    documents, top 50 (deterministic tie-break on the shingle)."""
    return P.boilerplate_ngrams(table(spark, sf_dir, "documents"), k=5, min_docs=3)


@register(
    "mixture_weighted_sample",
    oracle=r"""
    WITH s AS (
      SELECT source, n_chars,
             CASE (CAST(regexp_extract(source, 'src(\d+)', 1) AS INT) % 4)
               WHEN 0 THEN 1000 WHEN 1 THEN 500 WHEN 2 THEN 250
               ELSE 125 END AS thr,
             (doc_id * 2654435761) % 1000 AS gate
      FROM documents
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN gate < thr THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(sum(CASE WHEN gate < thr THEN n_chars ELSE 0 END) AS BIGINT)
             AS kept_chars
    FROM s GROUP BY source
    """,
)
def mixture_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic domain-mixture sampling: per-source weights
    (1.0/0.5/0.25/0.125 per-mille classes by source number mod 4)
    applied via the multiplicative-hash gate
    (operators/pipeline.py:mixture_keep)."""
    docs = table(spark, sf_dir, "documents")
    srcnum = F.regexp_extract("source", r"src(\d+)", 1).cast("int")
    thr = (
        F.when(srcnum % 4 == 0, 1000)
        .when(srcnum % 4 == 1, 500)
        .when(srcnum % 4 == 2, 250)
        .otherwise(125)
    )
    return P.mixture_weighted_sample(docs, thr)


@register(
    "corpus_pipeline_end_to_end",
    oracle=f"""
    WITH s AS (
      -- a NULL source has no place in a per-source census (NULL-twin
      -- contract; Spark's source equi-join would drop it silently —
      -- make the exclusion explicit on both engines)
      SELECT doc_id, source, text, string_split(text, ' ') AS t FROM documents
      WHERE source IS NOT NULL
    ), q AS (
      SELECT doc_id, source, text,
             len(t) >= 20
             AND (length(text) - len(t) + 1) * 1.0 / len(t) BETWEEN 3 AND 10
             AND len(list_filter(t, x -> x IN {_SQL_STOP_IN})) * 1.0 / len(t)
                 >= 0.01
             AND CASE WHEN len(t) - 1 > 0 THEN
                   (len(t) - 1
                    - (SELECT count(DISTINCT t[i] || ' ' || t[i+1])
                       FROM (SELECT unnest(range(1, len(t))) AS i)))
                   * 1.0 / (len(t) - 1)
                 ELSE 0.0 END <= 0.10 AS keep
      FROM s
    ), kept AS (
      SELECT doc_id, source, text,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM q WHERE keep
    ), c AS (
      SELECT doc_id, source,
             array_to_string(tok[st:st + 31], ' ') AS chunk_text
      FROM (SELECT doc_id, source, string_split(text, ' ') AS tok
            FROM kept WHERE rn = 1),
           LATERAL (SELECT unnest(range(1, greatest(len(tok), 1) + 1, 24)) AS st)
    )
    SELECT source,
           (SELECT count(*) FROM s s2 WHERE s2.source = c.source) AS n_docs,
           (SELECT count(*) FROM q q2 WHERE q2.source = c.source AND q2.keep)
             AS n_quality,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_kept,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(len(string_split(chunk_text, ' '))) AS BIGINT) AS n_tokens
    FROM c GROUP BY source
    """,
)
def corpus_pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-data preprocessing flow as ONE composed Spark
    job: C4 quality gate → exact keep-first dedup → fixed-window
    chunking → per-source corpus stats.

    Scale shape: the quality gate is map-only Catalyst arithmetic; dedup
    shuffles one 16-byte md5 key per surviving document (window
    keep-first on the hash, never the text); chunking is a map-only
    explode that never shuffles chunk bodies; the final per-source
    aggregate is partial-agg friendly. Net: TWO narrow shuffles
    end-to-end over a corpus-sized input — the shape a 100 TB
    preprocessing run needs.
    """
    from pyspark.sql import Window

    from csv2parquet_spark.operators.chunking import chunk_documents

    # NULL-source docs are excluded by contract (see oracle note) —
    # explicit here rather than implicitly via the final equi-join.
    # Gated rebalance + localCheckpoint (r11): the quality kernel feeds
    # two consumer branches (per-source gate stats + the kept-chain),
    # which re-ran the whole scan+filter chain per branch — round-robin
    # exchanges are not reused across branches — and the single-file
    # fixture scan ran each copy on ONE task. One rebalanced
    # materialization feeds both branches 32-way (2.4 → 1.2 s measured;
    # A/B: rebalance alone without the checkpoint was a wash).
    # r11 follow-up: checkpoint AFTER quality_columns — the first cut
    # materialized the filtered docs only, so the quality kernel (the
    # expensive map) still executed once per branch (profiled as two
    # equal heavy stages); materializing its output runs it once.
    docs = _pscan(
        table(spark, sf_dir, "documents").filter(F.col("source").isNotNull())
    )
    q = P.quality_columns(docs).localCheckpoint()
    per_source = q.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_quality"),
    )
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    kept = (
        q.filter("keep")
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("doc_id", "source", "text")
    )
    chunks = chunk_documents(kept, size=32, stride=24, extra_cols=("source",))
    stats = chunks.groupBy("source").agg(
        F.count_distinct("doc_id").alias("n_kept"),
        F.count("*").alias("n_chunks"),
        F.sum(F.size(F.split("chunk_text", " "))).alias("n_tokens"),
    )
    return per_source.join(stats, "source").select(
        "source", "n_docs", "n_quality", "n_kept", "n_chunks", "n_tokens"
    )


def _pii_oracle() -> str:
    """DuckDB twin of the PII scrub, generated from the SAME pattern
    table (operators/text.py:PII_PATTERNS) so the regexes cannot drift.
    Both engines' regex dialects meet in the RE2-compatible subset the
    patterns are restricted to."""
    from csv2parquet_spark.operators.text import PII_PATTERNS

    synth = (
        "text || ' mail u' || CAST(doc_id AS VARCHAR) || '@ex.org tel "
        "+12 3456 7' || CAST(doc_id % 90 + 10 AS VARCHAR) || ' ip 10.1.' "
        "|| CAST(doc_id % 200 AS VARCHAR) || '.9'"
    )
    scrub = "s"
    count_cols = []
    for name, pat, tag in PII_PATTERNS:
        lit = pat.replace("'", "''")
        count_cols.append(
            f"CAST(sum(len(regexp_extract_all({scrub}, '{lit}'))) AS BIGINT)"
            f" AS n_{name}"
        )
        scrub = f"regexp_replace({scrub}, '{lit}', '{tag}', 'g')"
    return f"""
    WITH s0 AS (SELECT source, {synth} AS s FROM documents)
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           {", ".join(count_cols)},
           CAST(sum(length(s)) AS BIGINT) AS chars_before,
           CAST(sum(length({scrub})) AS BIGINT) AS chars_after
    FROM s0 GROUP BY source
    """


@register("pii_redaction_audit", oracle=_pii_oracle())
def pii_redaction_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub audit over the corpus: per-source counts of redacted
    emails/IPs/phone-ish numbers and the byte shrinkage. Deterministic
    synthetic PII is appended per doc (the fixture corpus has none), so
    both engines see identical inputs. Map-only regexp chain in codegen
    (operators/text.py:redact_pii) + one small per-source aggregate —
    the 100 TB shape for corpus scrubbing."""
    from csv2parquet_spark.operators.text import count_pii, redact_pii

    docs = table(spark, sf_dir, "documents")
    synth = F.concat(
        F.col("text"),
        F.lit(" mail u"), F.col("doc_id").cast("string"),
        F.lit("@ex.org tel +12 3456 7"),
        (F.col("doc_id") % 90 + 10).cast("string"),
        F.lit(" ip 10.1."), (F.col("doc_id") % 200).cast("string"), F.lit(".9"),
    )
    s = docs.select("source", synth.alias("s"))
    counts = count_pii("s")
    return s.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        *[F.sum(c).alias(f"n_{k}") for k, c in counts.items()],
        F.sum(F.length("s")).alias("chars_before"),
        F.sum(F.length(redact_pii("s"))).alias("chars_after"),
    )


@register(
    "tfidf_top_terms",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ), tf AS (
      SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2
    ), df AS (
      SELECT token, count(*) AS df FROM tf GROUP BY 1
    ), n AS (
      SELECT count(*) AS n FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.token,
             tf.tf * (ln((n.n + 1.0) / (df.df + 1.0)) + 1.0) AS score
      FROM tf JOIN df USING (token), n
    ), ranked AS (
      SELECT doc_id, token, score,
             row_number() OVER (
               PARTITION BY doc_id ORDER BY score DESC, token
             ) AS rnk
      FROM scored
    )
    SELECT doc_id, CAST(rnk AS INTEGER) AS rnk, token, round(score, 6) AS score
    FROM ranked WHERE rnk <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (smoothed idf =
    ln((N+1)/(df+1)) + 1). Scale shape: tf is a partial-agg groupBy on
    (doc, token); df reuses tf's output (one more narrow agg); the idf
    join carries only (token, df); the per-doc top-3 runs as
    WindowGroupLimit — partial top-k below the exchange, so the shuffle
    never sees more than 3 rows per (partition, doc)."""
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    n = docs.count()  # corpus cardinality: one tiny job, model-sized
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("token").agg(F.count("*").alias("df"))
    scored = tf.join(df_, "token").select(
        "doc_id",
        "token",
        (F.col("tf") * (F.log((n + 1.0) / (F.col("df") + 1.0)) + 1.0)).alias(
            "score"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "token")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter("rnk <= 3")
        .select("doc_id", "rnk", "token", F.round("score", 6).alias("score"))
    )


@register(
    "train_val_test_split",
    oracle="""
    WITH s AS (
      SELECT source, n_chars,
             CASE WHEN (doc_id * 2654435761) % 1000 < 50 THEN 'val'
                  WHEN (doc_id * 2654435761) % 1000 < 100 THEN 'test'
                  ELSE 'train' END AS split
      FROM documents
    )
    SELECT source, split, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS n_chars
    FROM s GROUP BY source, split
    """,
)
def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test assignment from the doc id
    (operators/pipeline.py:split_assign) — reproducible across runs and
    engines, unlike randomSplit; summarized per (source, split).
    Map-only gate + one small aggregate."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.withColumn("split", P.split_assign())
        .groupBy("source", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("n_chars"),
        )
    )


@register(
    "unigram_logprob_scores",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ), freq AS (
      SELECT t, count(*) AS c FROM tok GROUP BY t
    ), n AS (
      SELECT count(*) AS n FROM tok
    )
    SELECT tok.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           round(-sum(ln(freq.c * 1.0 / n.n)) / count(*), 6) AS nll
    FROM tok JOIN freq USING (t), n
    GROUP BY tok.doc_id
    """,
)
def unigram_logprob_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality signal: per-document mean negative
    log-likelihood under the corpus's own unigram token model (unusual
    token mixes score high → outlier docs). Scale shape: the frequency
    table is one partial-agg groupBy; scoring joins tokens to it on the
    token key and reduces per doc — two narrow shuffles, no Python. In
    production the LM is trained once on a reference corpus and
    broadcast; here it's self-trained so the oracle can reproduce it."""
    docs = table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
    freq = tok.groupBy("t").agg(F.count("*").alias("c"))
    n = tok.count()  # corpus token count: one scalar to the driver
    return (
        tok.join(freq, "t")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                -F.sum(F.log(F.col("c") * 1.0 / n)) / F.count("*"), 6
            ).alias("nll"),
        )
    )


@register(
    "token_entropy_quality",
    oracle="""
    WITH counts AS (
      SELECT doc_id, tok, count(*) AS c
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      WHERE tok <> ''
      GROUP BY doc_id, tok
    ),
    stats AS (
      SELECT doc_id,
             CAST(sum(c) AS BIGINT) AS n_tokens,
             count(*) AS n_types,
             CAST(sum(CAST(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))
                            AS DECIMAL(38,6))) AS DOUBLE) AS sclog
      FROM counts GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, n_types,
           round(log2(CAST(n_tokens AS DOUBLE)) - sclog / n_tokens, 6) AS entropy,
           round(CAST(n_types AS DOUBLE) / n_tokens, 6) AS ttr
    FROM stats
    """,
)
def token_entropy_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon token entropy + type/token ratio — the
    repetition-quality signal C4/Gopher-style filters threshold on.

    H = log2(n) - sum(c*log2(c))/n from the per-(doc, token) counts, so
    a single explode -> two-level aggregate computes it with map-side
    partial aggregation; the per-type log terms are decimal-cast before
    summing (association-order-proof, same discipline as dsum). Both
    shuffles key on doc_id(+token) — high-cardinality, skew-free.
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    counts = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    cd = F.col("c").cast("double")
    stats = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_types"),
        F.sum((cd * F.log2(cd)).cast("decimal(38,6)"))
        .cast("double")
        .alias("sclog"),
    )
    return stats.select(
        "doc_id",
        "n_tokens",
        "n_types",
        F.round(
            F.log2(F.col("n_tokens").cast("double"))
            - F.col("sclog") / F.col("n_tokens"),
            6,
        ).alias("entropy"),
        F.round(F.col("n_types").cast("double") / F.col("n_tokens"), 6).alias("ttr"),
    )


@register(
    "mixture_temperature_sample",
    oracle="""
    WITH s AS (
      SELECT source, count(*) AS ns FROM documents GROUP BY source
    ), t AS (
      SELECT sum(sqrt(CAST(ns AS DOUBLE))) AS tot,
             CAST(sum(ns) AS DOUBLE) AS n
      FROM s
    ), r AS (
      SELECT source, ns,
             least(1000, CAST(floor(
               CAST(0.5 AS DOUBLE) * (SELECT n FROM t)
               * sqrt(CAST(ns AS DOUBLE)) / (SELECT tot FROM t)
               / CAST(ns AS DOUBLE) * 1000) AS INT)) AS thr
      FROM s
    )
    SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
           r.thr AS thr_permille,
           CAST(sum(CASE WHEN (d.doc_id * 2654435761) % 1000 < r.thr
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM documents d JOIN r ON d.source = r.source
    GROUP BY d.source, r.thr
    """,
)
def mixture_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixture (the multilingual alpha-
    sampling recipe, alpha = 0.5): target share of source s is
    sqrt(n_s)/sum(sqrt(n_t)) — flattening the natural distribution —
    realized as a per-source keep rate against a total budget of N/2
    docs, capped at 1, through the same deterministic multiplicative-
    hash per-mille gate as ``mixture_weighted_sample``.

    Scale shape: source stats are a model-sized aggregate (one row per
    source) broadcast back onto the corpus; the gate is a map-side
    expression — the corpus is scanned once, never shuffled. Rates are
    derived with IEEE-exact ops (sqrt/mul/div in a fixed association
    order) so both engines compute bit-identical thresholds.
    """
    docs = table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(F.count("*").alias("ns"))
    t = s.agg(
        F.sum(F.sqrt(F.col("ns").cast("double"))).alias("tot"),
        F.sum("ns").cast("double").alias("n"),
    )
    r = (
        s.crossJoin(F.broadcast(t))
        .select(
            "source",
            F.least(
                F.lit(1000),
                F.floor(
                    F.lit(0.5)
                    * F.col("n")
                    * F.sqrt(F.col("ns").cast("double"))
                    / F.col("tot")
                    / F.col("ns").cast("double")
                    * F.lit(1000)
                ).cast("int"),
            ).alias("thr"),
        )
    )
    gate = (F.col("doc_id") * 2654435761) % 1000
    return (
        docs.join(F.broadcast(r), "source")
        .groupBy("source", "thr")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(gate < F.col("thr"), 1).otherwise(0)).alias("n_kept"),
        )
        .select(
            "source", "n_docs", F.col("thr").alias("thr_permille"), "n_kept"
        )
    )


@register(
    "bigram_lm_scores",
    oracle="""
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS arr FROM documents
    ), bg AS (
      SELECT doc_id, arr[i] AS w1, arr[i + 1] AS w2
      FROM tok, LATERAL (SELECT unnest(range(1, len(arr))) AS i) _l
      WHERE len(arr) > 1
    ), c2 AS (
      SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2
    ), c1 AS (
      SELECT w1, sum(c2) AS c1 FROM c2 GROUP BY w1
    ), v AS (
      SELECT count(DISTINCT t) AS v
      FROM (SELECT w1 AS t FROM c2 UNION SELECT w2 FROM c2)
    )
    SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(-sum(ln(CAST(c2.c2 + 1 AS DOUBLE)
                         / CAST(c1.c1 + v.v AS DOUBLE))) / count(*), 6)
             AS nll2
    FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1), v
    GROUP BY bg.doc_id
    """,
)
def bigram_lm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality filter, one order up from the unigram
    twin: per-document mean negative log-likelihood under an add-one-
    smoothed BIGRAM model trained on the corpus itself —
    p(w2|w1) = (c(w1,w2) + 1) / (c(w1) + |V|). Documents whose token
    TRANSITIONS are unusual (not just their token mix) score high; this
    is the signal CCNet/Gopher pipelines threshold on (they use KenLM;
    the distributed shape is identical).

    Scale shape: bigram pairs are built MAP-SIDE (split once, zip the
    array against its own tail, explode) — no join builds them; the
    model is two partial-agg groupBys over the pair relation, pinned
    with localCheckpoint so context counts, the vocabulary size AND the
    scoring join all read the model-sized pair table instead of
    re-deriving it from the corpus (|V| is defined over bigram-member
    tokens — self-contained in the model, zero extra corpus passes,
    identical on both engines by the same definition). TWO corpus scans
    total (model build + scoring side); everything integer until one
    division, so ln() agrees to well under the 6 dp round."""
    docs = table(spark, sf_dir, "documents")
    arr = F.split("text", " ")
    bg = docs.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice(arr, 1, F.greatest(F.size(arr) - 1, F.lit(0))).alias("w1"),
                F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))).alias("w2"),
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2")).localCheckpoint()
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    v = (
        c2.select("w1")
        .union(c2.select(F.col("w2").alias("w1")))
        .distinct()
        .count()
    )  # |V| from the checkpointed model relation — no corpus re-scan
    return (
        bg.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                -F.sum(
                    F.log(
                        (F.col("c2") + 1).cast("double")
                        / (F.col("c1") + F.lit(v)).cast("double")
                    )
                )
                / F.count(F.lit(1)),
                6,
            ).alias("nll2"),
        )
    )


# ---------------------------------------------------------------------------
# URL canonicalization — the CommonCrawl-style URL-dedup front door.
# ---------------------------------------------------------------------------


@register(
    "url_canonical_dedup",
    oracle="""
    WITH u AS (
      SELECT lower(source) || '.example.com' AS domain,
             lower(source) || '.example.com/docs/'
               || CAST(doc_id % 211 AS VARCHAR) AS canonical,
             doc_id
      FROM documents
    )
    SELECT domain,
           count(*) AS n_urls,
           count(DISTINCT canonical) AS n_canonical,
           count(*) - count(DISTINCT canonical) AS n_dupes,
           -- a NULL source builds no URL: nothing to extract utm/ref
           -- from, so those rows contribute 0 (NULL-twin contract;
           -- on the NULL-free driver fixture this equals count(*))
           CAST(sum(CASE WHEN domain IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_utm_ok,
           CAST(sum(CASE WHEN domain IS NOT NULL THEN doc_id ELSE 0 END)
                AS BIGINT) AS sum_ref
    FROM u
    GROUP BY domain
    """,
)
def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + domain-level dedup census, with Spark
    EARNING the parse while the oracle derives it from construction.

    Each document synthesizes a messy-but-valid URL (mixed-case host,
    tracking query params, fragment); Spark canonicalizes it with the
    real ``parse_url`` built-in — lowercased HOST + PATH, query and
    fragment stripped — and counts per-domain exact-duplicate
    canonicals (doc_id % 211 forces collisions). The DuckDB oracle
    never parses: it recomputes host/path/ref from the id arithmetic
    that built the URL, so any parse_url deviation (fragment leaking
    into QUERY, case-sensitive host, param misextraction) breaks the
    hash. ``n_utm_ok`` counts rows whose extracted ``utm`` param is
    exactly ``'x'`` — the fragment-leak canary.

    Scale: map-side parse + one partial-agg on (domain, canonical) —
    the same two-level exact-distinct shape as ``agg_distinct_counts``;
    shuffles carry short canonical strings, never document text.
    """
    d = table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.upper(F.substring("source", 1, 1)),
        F.expr("substring(source, 2)"),
        F.lit(".Example.COM/docs/"),
        (F.col("doc_id") % 211).cast("string"),
        F.lit("?ref="),
        F.col("doc_id").cast("string"),
        F.lit("&utm=x#sec"),
        (F.col("doc_id") % 3).cast("string"),
    )
    parsed = d.select(
        "doc_id",
        F.lower(F.parse_url(url, F.lit("HOST"))).alias("domain"),
        F.concat(
            F.lower(F.parse_url(url, F.lit("HOST"))),
            F.parse_url(url, F.lit("PATH")),
        ).alias("canonical"),
        F.parse_url(url, F.lit("QUERY"), F.lit("ref")).alias("ref"),
        F.parse_url(url, F.lit("QUERY"), F.lit("utm")).alias("utm"),
    )
    return parsed.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct("canonical").alias("n_canonical"),
        (F.count(F.lit(1)) - F.countDistinct("canonical")).alias("n_dupes"),
        # when/otherwise(0) + coalesce(…, 0): an unparseable (NULL-
        # source) URL contributes 0, matching the oracle's CASE — a
        # bare sum over the NULL group would emit NULL and flip the
        # whole pandas column to float (NULL-twin audit r10).
        F.sum(F.when(F.col("utm") == "x", 1).otherwise(0))
        .cast("long")
        .alias("n_utm_ok"),
        F.sum(F.coalesce(F.col("ref").cast("long"), F.lit(0)))
        .cast("long")
        .alias("sum_ref"),
    )


_DSIR_B = 256  # hashed-feature buckets (2 hex chars of md5)


@register(
    "dsir_importance_weights",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang, string_split(text, ' ') AS arr FROM documents
    ), bg AS (
      SELECT doc_id, lang,
             substring(md5(arr[i] || ' ' || arr[i + 1]), 1, 2) AS bucket
      FROM tok, LATERAL (SELECT unnest(range(1, len(arr))) AS i) _l
      WHERE len(arr) > 1
    ), m AS (
      SELECT bucket, CAST(count(*) AS BIGINT) AS cr,
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ct
      FROM bg GROUP BY bucket
    ), tot AS (
      SELECT CAST(sum(cr) AS BIGINT) AS nr, CAST(sum(ct) AS BIGINT) AS nt
      FROM m
    )
    SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
           round(sum(ln(CAST((m.ct + 1) * (tot.nr + {_DSIR_B}) AS DOUBLE)
                        / CAST((m.cr + 1) * (tot.nt + {_DSIR_B}) AS DOUBLE))),
                 6) AS logweight
    FROM bg JOIN m USING (bucket), tot
    GROUP BY bg.doc_id
    """,
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): per-document log
    importance weight log(p_target(x)/p_raw(x)) under hashed-bigram
    bag-of-features models — the published recipe for picking raw-web
    documents that look like a target domain. Here target = the 'en'
    slice of the corpus, raw = the whole corpus, features = token
    bigrams hashed into {_DSIR_B} buckets (2 hex chars of md5 — the
    bucket ID stays a string; no hex parsing, per the engine's
    md5-slice convention), add-one smoothing on both models.

    Scale shape: bigrams build MAP-SIDE (slice/zip/explode, the
    bigram_lm_scores shape — no join); the feature MODEL is one
    groupBy(bucket) with conditional counts ({_DSIR_B} rows — broadcast
    back), totals are a 1-row broadcast; scoring is a map-only
    broadcast join + one doc_id aggregation. TWO shuffles end-to-end
    (bucket model + per-doc rollup), both on synthetic keys; the corpus
    never re-shuffles by content. Everything is integer until ONE
    ln(ratio-of-integer-products) per occurrence, so the engines agree
    to well under the 6 dp round (the proven bigram_lm_scores
    discipline)."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    arr = F.split("text", " ")
    bg = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.arrays_zip(
                F.slice(arr, 1, F.greatest(F.size(arr) - 1, F.lit(0))).alias("w1"),
                F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))).alias("w2"),
            )
        ).alias("p"),
    ).select(
        "doc_id",
        "lang",
        F.substring(
            F.md5(F.concat(F.col("p.w1"), F.lit(" "), F.col("p.w2"))), 1, 2
        ).alias("bucket"),
    )
    m = bg.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cr"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("ct"),
    )
    tot = m.agg(
        F.sum("cr").alias("nr"), F.sum("ct").alias("nt")
    )
    scored = bg.join(F.broadcast(m), "bucket").crossJoin(F.broadcast(tot))
    term = F.log(
        ((F.col("ct") + 1) * (F.col("nr") + _DSIR_B)).cast("double")
        / ((F.col("cr") + 1) * (F.col("nt") + _DSIR_B)).cast("double")
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_feats"),
        F.round(F.sum(term), 6).alias("logweight"),
    )


_CRAWL_BUDGET = 300


@register(
    "crawl_budget_largest_remainder",
    oracle=f"""
    WITH d AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source
    ), tot AS (
      SELECT CAST(sum(n_docs) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS n_src
      FROM d
    ), q AS (
      SELECT d.source, d.n_docs,
             ({_CRAWL_BUDGET} * d.n_docs) // tot.total AS base_quota,
             ({_CRAWL_BUDGET} * d.n_docs) % tot.total AS remainder
      FROM d, tot
    ), r AS (
      SELECT source, n_docs, base_quota, remainder,
             row_number() OVER (ORDER BY remainder DESC, source) AS rk,
             {_CRAWL_BUDGET} - sum(base_quota) OVER () AS leftover
      FROM q
    )
    SELECT source, n_docs, CAST(base_quota AS BIGINT) AS base_quota,
           CAST(base_quota + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS allocated
    FROM r
    """,
)
def crawl_budget_largest_remainder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain crawl/sampling budget via the LARGEST-REMAINDER
    (Hamilton) method: split a global budget of 300 document slots
    across sources proportionally to their corpus share, with the
    integer leftovers going to the largest fractional remainders (ties
    to source name) — allocations sum to the budget EXACTLY, which
    naive per-domain rounding does not guarantee. The shape every
    crawler / dataset-mixing scheduler needs when "18.37 slots" must
    become an integer plan.

    Scale shape: one map-side-combining count per source collapses the
    corpus to the MODEL-SIZED domain relation; everything after stays
    on that relation — the remainder rank is a broadcast self-join
    count (no global Window: a single-partition sort over domains would
    be lint-bait, and rank-by-count needs no sort at all), totals are
    1-row broadcasts. Everything integer (DIV / %) ⇒ engine-exact."""
    d = table(spark, sf_dir, "documents").groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    tot = d.agg(
        F.sum("n_docs").alias("total"), F.count(F.lit(1)).alias("n_src")
    )
    q = d.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        F.expr(f"({_CRAWL_BUDGET} * n_docs) DIV total").alias("base_quota"),
        (F.lit(_CRAWL_BUDGET) * F.col("n_docs") % F.col("total")).alias(
            "remainder"
        ),
    )
    # rank by (remainder DESC, source): rk = 1 + #{rows strictly ahead},
    # via a broadcast self-join over the domain relation
    other = q.select(
        F.col("source").alias("o_source"), F.col("remainder").alias("o_rem")
    )
    ahead = (F.col("o_rem") > F.col("remainder")) | (
        (F.col("o_rem") == F.col("remainder"))
        & (F.col("o_source") < F.col("source"))
    )
    rk = (
        q.join(F.broadcast(other), ahead, "left")
        .groupBy("source", "n_docs", "base_quota")
        .agg((F.count("o_source") + 1).alias("rk"))
    )
    leftover = q.agg(
        (F.lit(_CRAWL_BUDGET) - F.sum("base_quota")).alias("leftover")
    )
    return rk.crossJoin(F.broadcast(leftover)).select(
        "source",
        "n_docs",
        F.col("base_quota").cast("long").alias("base_quota"),
        (
            F.col("base_quota")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("long")
        .alias("allocated"),
    )


@register(
    "stratified_sample_exact",
    oracle="""
    SELECT lang, doc_id, h AS sample_key
    FROM (
      SELECT lang, doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    ) WHERE rn <= 10
    """,
)
def stratified_sample_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-quota stratified sample: the 10 audit documents per
    language stratum, selected by md5(doc_id) order — the
    deterministic, engine-portable "spot-check N per class" draw every
    QA/labeling pipeline needs (hash order ≈ uniform, reproducible
    across runs/engines, and independent of physical row order, unlike
    TABLESAMPLE).

    Scale shape: the rank ≤ k window compiles to WindowGroupLimit with
    a PARTIAL pass below the exchange — every map task forwards at most
    k rows per stratum, so the shuffle carries ≤ k·P·strata rows, never
    the corpus, and no per-stratum full sort happens on one task.
    """
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        d.select("lang", "doc_id", h.alias("sample_key"),
                 F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 10)
        .select("lang", "doc_id", "sample_key")
    )


@register(
    "pps_systematic_sample",
    oracle="""
    WITH g AS (
      SELECT doc_id, n_chars,
             sum(n_chars) OVER (ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum
      FROM documents
    ), t AS (SELECT max(cum) AS total FROM g)
    SELECT doc_id, n_chars, CAST(cum AS BIGINT) AS cum,
           CAST((cum * 97) // total AS BIGINT) AS bucket
    FROM g, t
    WHERE (cum * 97) // total > ((cum - n_chars) * 97) // total
    """,
)
def pps_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability-proportional-to-size SYSTEMATIC sample: walk the
    doc_id-ordered cumulative char mass and take the document at every
    1/97th crossing — each doc's selection probability is proportional
    to its size, with zero randomness (deterministic, reproducible,
    engine-portable) and exactly one pass. This is the sampling shape
    for building size-weighted eval/calibration subsets from a 100 TB
    corpus: a k-crossing is `floor(cum·k/total) > floor((cum−w)·k/total)`
    — pure BIGINT arithmetic, no float inverse-CDF.

    The running sum uses the scalable two-pass ``global_cumsum`` (range
    partition + broadcast offsets), not a single-partition window; the
    oracle states the same prefix sum as ANSI window SQL. 97 is prime
    so bucket boundaries never alias periodic doc-size patterns."""
    from csv2parquet_spark.operators.ranking import global_cumsum

    d = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    # total from the cumsum's own pass-1 sums (r11) — max("cum") cost a
    # separate job over the checkpointed relation for one integer
    cum, _tot = global_cumsum(
        d, keys=["doc_id"], weight_col="n_chars", cum_col="cum",
        return_totals=True,
    )
    total = _tot["n_chars"]
    return (
        cum.filter(
            F.expr(f"(cum * 97) DIV {total}")
            > F.expr(f"((cum - n_chars) * 97) DIV {total}")
        )
        .select(
            "doc_id",
            "n_chars",
            F.col("cum").cast("long").alias("cum"),
            F.expr(f"(cum * 97) DIV {total}").cast("long").alias("bucket"),
        )
    )


@register(
    "dedup_savings_by_source",
    oracle="""
    WITH k AS (
      SELECT doc_id, source, n_chars,
             min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN doc_id <> keep_id THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dropped,
           CAST(sum(n_chars) AS BIGINT) AS bytes_total,
           CAST(sum(CASE WHEN doc_id <> keep_id THEN n_chars ELSE 0 END)
                AS BIGINT) AS bytes_saved
    FROM k GROUP BY source
    """,
)
def dedup_savings_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup accounting: per source, how many documents exact-dedup
    would drop (keep-first by md5, the ``exact_dedup`` rule) and how
    many bytes that saves — the cost-justification rollup a pipeline
    owner reads before turning dedup on, and the per-source skew
    signal (one crawl source re-serving its corpus shows up here).

    One hash-partitioned window over (md5 → min doc_id) — the same
    single-shuffle keep-decision shape as exact dedup — then a
    source-keyed aggregate. No join-back: the window carries the keep
    id alongside the row."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5("text"))
    k = d.select(
        "doc_id", "source", "n_chars", F.min("doc_id").over(w).alias("keep_id")
    )
    dropped = F.col("doc_id") != F.col("keep_id")
    return k.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(dropped.cast("long")).alias("n_dropped"),
        F.sum("n_chars").cast("long").alias("bytes_total"),
        F.sum(F.when(dropped, F.col("n_chars")).otherwise(0)).cast("long").alias("bytes_saved"),
    )
