"""JSONL→Parquet conversion (engine extension beyond the reference's
CSV-only surface — `/root/reference/src/main.rs:48-54` accepts only
`<CSV> <PARQUET>`).

JSON-lines is the de-facto interchange format for LLM training corpora
(one document object per line), so the engine exposes the same converter
contract for it: schema inference (capped or full), explicit schema
files, the W1-W9 parquet writer knobs, single-file parity mode, and the
parse-mode ladder. The plan stays scan→project→write, narrow-only, no
shuffle — JSONL without multiline objects is line-splittable, so a 100 TB
input fans out exactly like the CSV path.

Differences from CSV, by design:
  * no header/delimiter knobs (not meaningful);
  * inference is Spark's native JSON schema inference — it already
    handles nested objects/arrays, which the CSV lattice never sees;
  * ``max_read_records`` caps inference by sampling the FIRST n lines
    (mirrors the reference's ``--max-read-records`` contract of
    "inference reads at most n records", main.rs:60-62); 0 still means
    "no inference" — everything lands as string.
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from csv2parquet_spark.converter.convert import (
    ConvertOptions,
    write_parquet,
)
from csv2parquet_spark.converter.schema_json import (
    arrow_json_to_struct,
    struct_to_arrow_json,
)


# Lines consulted for field NAMES when max_read_records=0 ("skip
# inference"): enough to see every field of any sane corpus header-less
# format, while keeping the names pass O(1) in the corpus size.
_NAME_SAMPLE_LINES = 1000


def _infer_jsonl_schema(
    spark: SparkSession, jsonl_path: str, opts: ConvertOptions
) -> T.StructType:
    if opts.schema_file:
        with open(opts.schema_file) as f:
            return arrow_json_to_struct(f.read())
    if opts.max_read_records == 0:
        # CSV-parity contract: 0 sampled records → all columns string.
        # Field NAMES still need a look at the data (JSON has no header
        # line) — but "0 = skip inference" must not pay a corpus scan,
        # so names come from the first _NAME_SAMPLE_LINES lines only
        # (limit() short-circuits each split's read). Caveat, documented:
        # a field that first appears beyond the sample window is dropped;
        # pass a schema file or max_read_records>0 for full coverage.
        sample = spark.read.text(jsonl_path).limit(_NAME_SAMPLE_LINES)
        named = spark.read.json(sample.rdd.map(lambda r: r.value)).schema
        return T.StructType([T.StructField(f.name, T.StringType()) for f in named])
    if opts.max_read_records is not None:
        # Cap inference: parse only the first n lines. limit() before
        # the JSON parse prunes the text scan to the first file splits.
        sample = spark.read.text(jsonl_path).limit(opts.max_read_records)
        return (
            spark.read.json(sample.rdd.map(lambda r: r.value)).schema
        )
    return spark.read.json(jsonl_path).schema


def read_jsonl(
    spark: SparkSession, jsonl_path: str, opts: ConvertOptions | None = None
) -> DataFrame:
    """JSONL scan with a frozen, pre-resolved schema (never inference at
    read time — same discipline as the CSV path: O1/O2 separation)."""
    opts = opts or ConvertOptions()
    schema = _infer_jsonl_schema(spark, jsonl_path, opts)
    return spark.read.options(mode=opts.parse_mode).schema(schema).json(jsonl_path)


def convert_jsonl(
    spark: SparkSession,
    jsonl_path: str,
    parquet_path: str,
    opts: ConvertOptions | None = None,
    out=sys.stdout,
    err=sys.stderr,
) -> T.StructType | None:
    """JSONL→Parquet with the converter's full option surface."""
    opts = opts or ConvertOptions()
    schema = _infer_jsonl_schema(spark, jsonl_path, opts)

    if opts.print_schema or opts.dry:
        print("Schema:", file=err)
        print(struct_to_arrow_json(schema), file=out)
        if opts.dry:
            return schema

    df = spark.read.options(mode=opts.parse_mode).schema(schema).json(jsonl_path)
    write_parquet(spark, df, jsonl_path, parquet_path, opts)
    return schema


def _infer_json_schema(
    spark: SparkSession, json_path: str, opts: ConvertOptions
) -> T.StructType:
    if opts.schema_file:
        with open(opts.schema_file) as f:
            return arrow_json_to_struct(f.read())
    inferred = spark.read.option("multiLine", "true").json(json_path).schema
    if opts.max_read_records == 0:
        # CSV-parity contract: 0 sampled records → all columns string.
        # Unlike JSONL there is no line-sampled names pass: a multi-line
        # document is not line-splittable, so field names come from the
        # same document parse inference does (no extra corpus cost — the
        # reader must parse whole documents either way).
        return T.StructType(
            [T.StructField(f.name, T.StringType()) for f in inferred]
        )
    return inferred


def convert_json(
    spark: SparkSession,
    json_path: str,
    parquet_path: str,
    opts: ConvertOptions | None = None,
    out=sys.stdout,
    err=sys.stderr,
) -> T.StructType | None:
    """Multi-line ``.json`` → Parquet (``--format json``): a file holding
    ONE pretty-printed object or a top-level ARRAY of objects — the
    shapes the line-oriented JSONL reader misparses. Same converter
    surface (schema files, W1-W9 writer knobs, --dry/--print-schema
    banner, parse-mode ladder).

    NOT supported: CONCATENATED multi-line objects in one file — Spark's
    wholeFile parser stops after the first top-level value and raises
    nothing (even FAILFAST), so such input converts to ONE row; the
    limitation is pinned in tests. Concatenated objects that are
    one-per-line are JSONL (use ``--format jsonl``); otherwise
    pre-split into one document per file.

    Scale note, by design: multiLine JSON is a DOCUMENT format — each
    file parses as one unsplittable task, so parallelism comes from the
    file count, not splits. ``max_read_records`` caps are line-based
    and don't apply here (documents must parse whole); inference is a
    full pass, as the reference's default inference is for CSV. For
    100 TB corpora use JSONL, which fans out per split.
    """
    opts = opts or ConvertOptions()
    schema = _infer_json_schema(spark, json_path, opts)

    if opts.print_schema or opts.dry:
        print("Schema:", file=err)
        print(struct_to_arrow_json(schema), file=out)
        if opts.dry:
            return schema

    df = (
        spark.read.options(mode=opts.parse_mode, multiLine="true")
        .schema(schema)
        .json(json_path)
    )
    write_parquet(spark, df, json_path, parquet_path, opts)
    return schema
