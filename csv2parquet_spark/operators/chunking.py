"""Document chunking for LLM-pipeline preprocessing (SURVEY.md §2.7/§2.8):
split each document into fixed-size token windows with overlap.

Two implementations of the SAME semantics:

* :func:`chunk_documents` — pure Catalyst (sequence → transform/slice →
  posexplode). The hot path: whole-stage codegen, no Python, map-only
  (the explode multiplies rows but never shuffles).
* :func:`chunk_documents_udtf` — a Python UDTF (Spark 4.x lateral-join
  table function), demonstrating the user-extensibility surface the
  reference lacks (main.rs:45-119 is a closed CLI). Arrow-batched, but
  still the slow path — it exists to prove the UDTF plumbing, with the
  Catalyst version as the performance twin (both hash-match the same
  DuckDB oracle).

Chunk grammar (size s, stride d): token starts 1, 1+d, 1+2d, … ≤ n;
chunk i = tokens[start : start+s-1] joined by a single space; the last
chunk may be shorter (slice clamps). Tokenization is a single-space
split for byte parity with the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CHUNK_SCHEMA = "doc_id bigint, chunk_idx int, chunk_text string"


def chunk_documents(
    df: DataFrame,
    size: int = 32,
    stride: int = 24,
    text_col: str = "text",
    id_col: str = "doc_id",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id, chunk_idx, chunk_text[, *extra_cols]) via Catalyst array
    ops only. ``extra_cols`` are carried through the explode (no join
    needed downstream to recover metadata like source/lang).

    NULL contract (r11): a NULL text produces NO chunks (the row is
    dropped) — the alternative, one chunk of '' per textless doc, is
    an artifact of concat_ws's NULL-swallowing, not a chunk."""
    df = df.filter(F.col(text_col).isNotNull())
    tok = F.split(text_col, " ")
    n = F.size(tok)
    starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(stride))
    chunks = F.transform(starts, lambda s: F.concat_ws(" ", F.slice(tok, s, size)))
    return df.select(
        F.col(id_col).alias("doc_id"),
        *[F.col(c) for c in extra_cols],
        F.posexplode(chunks).alias("chunk_idx", "chunk_text"),
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        "chunk_text",
        *[F.col(c) for c in extra_cols],
    )


def make_chunk_udtf(size: int = 32, stride: int = 24):
    """Build the UDTF class for the given chunk grammar (closure-free:
    parameters are baked into the class so executors need no pickled
    state beyond it)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType=CHUNK_SCHEMA)
    class ChunkDocs:
        def eval(self, doc_id, text):  # noqa: ANN001 - UDTF contract
            if text is None:  # NULL contract (r11): no chunks
                return
            toks = text.split(" ")
            idx = 0
            for start in range(0, max(len(toks), 1), stride):
                yield doc_id, idx, " ".join(toks[start : start + size])
                idx += 1

    return ChunkDocs


def chunk_documents_udtf(
    spark: SparkSession,
    df: DataFrame,
    size: int = 32,
    stride: int = 24,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Same chunk grammar through a registered Python UDTF + LATERAL join."""
    spark.udtf.register("chunk_docs_udtf", make_chunk_udtf(size, stride))
    df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
              ).createOrReplaceTempView("__chunk_input")
    return spark.sql(
        """
        SELECT c.doc_id, c.chunk_idx, c.chunk_text
        FROM __chunk_input d, LATERAL chunk_docs_udtf(d.doc_id, d.text) c
        """
    )
