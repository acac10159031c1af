"""Incremental (manifest-driven) conversion — engine extension beyond
the reference's one-shot CLI (`main.rs` converts exactly one file per
invocation): convert a DIRECTORY of inputs into a parquet dataset,
recording per-file (size, mtime) in a JSON manifest so a re-run
converts only new or changed files. This is the continuous-ingestion
shape: a crawler keeps dropping CSV/JSONL files, the converter runs on
a schedule, and each run costs only the delta.

Design notes for the 100 TB path:
- Each batch writes under ``out_dir/batch=<n>/`` in multi-part mode —
  batches are immutable once committed, so readers (Spark, DuckDB with
  ``hive_partitioning``) see a consistent dataset and the writer never
  rewrites history (the same append-only contract as the streaming
  sinks in ``streaming/sinks.py``).
- The manifest commit is atomic (tmp file + ``os.replace``) and happens
  AFTER the batch directory is fully written: a crash mid-batch leaves
  an orphan ``batch=`` dir that the next run overwrites (same batch
  number is re-derived from the manifest), never a manifest that
  claims unconverted data.
- File identity is (path, size, mtime_ns): content-hashing every input
  would re-read the corpus; size+mtime is the rsync-style tradeoff and
  a CHANGED file (same path, new stats) is reconverted in the next
  batch — last batch wins for readers that dedup on input_file.
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import dataclass

from pyspark.sql import SparkSession

from csv2parquet_spark.converter.convert import ConvertOptions, convert


@dataclass
class IncrementalResult:
    batch: int | None          # None = nothing new
    converted: list[str]       # input paths converted this run
    skipped: int               # inputs already in the manifest


def _load_manifest(path: str) -> dict:
    """Missing manifest = a fresh dataset (start at batch 0). A manifest
    that EXISTS but cannot be parsed is corruption, not freshness —
    silently resetting to ``next_batch: 0`` would reconvert the whole
    corpus into ``batch=0`` alongside the committed ``batch=1..n`` dirs,
    and every ``batch=*/`` reader would see full duplicates (ADVICE r6).
    Raise and make the operator decide (restore the manifest or wipe the
    output dir)."""
    if not os.path.exists(path):
        return {"files": {}, "next_batch": 0}
    try:
        with open(path) as f:
            m = json.load(f)
    except (OSError, json.JSONDecodeError) as exc:
        raise ValueError(
            f"incremental manifest {path!r} exists but is unreadable or "
            f"not valid JSON ({exc}); refusing to reset next_batch — "
            "restore the manifest or remove it together with the output "
            "batch=* directories"
        ) from exc
    if not isinstance(m, dict) or not isinstance(m.get("files"), dict):
        raise ValueError(
            f"incremental manifest {path!r} parsed but lacks the "
            "expected {'files': {...}, 'next_batch': n} shape; refusing "
            "to reset next_batch"
        )
    m.setdefault("next_batch", 0)
    return m


def _commit_manifest(path: str, manifest: dict) -> None:
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(prefix=".manifest", dir=d)
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def _file_key(path: str) -> str:
    st = os.stat(path)
    return f"{st.st_size}:{st.st_mtime_ns}"


def convert_incremental(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    manifest_path: str,
    opts: ConvertOptions | None = None,
    extensions: tuple[str, ...] = (".csv", ".jsonl", ".json", ".xml", ".orc", ".parquet"),
) -> IncrementalResult:
    """Convert every not-yet-seen input file under ``input_dir`` into
    ``output_dir/batch=<n>/<stem>.parquet``; record conversions in the
    manifest at ``manifest_path``. Returns what happened.

    Inputs convert through the ordinary :func:`convert` path (schema
    inference / schema file / all write knobs in ``opts`` apply), in
    multi-part mode per file so each conversion parallelizes across the
    file's splits.
    """
    opts = opts or ConvertOptions()
    manifest = _load_manifest(manifest_path)
    seen: dict = manifest["files"]

    inputs = sorted(
        os.path.join(input_dir, f)
        for f in os.listdir(input_dir)
        if os.path.isfile(os.path.join(input_dir, f))
        and f.lower().endswith(extensions)
    )
    todo = [p for p in inputs if seen.get(p) != _file_key(p)]
    skipped = len(inputs) - len(todo)
    if not todo:
        return IncrementalResult(batch=None, converted=[], skipped=skipped)

    batch = int(manifest["next_batch"])
    batch_dir = os.path.join(output_dir, f"batch={batch}")
    os.makedirs(batch_dir, exist_ok=True)
    from dataclasses import replace

    multi = replace(opts, single_file=False, print_schema=False, dry=False)
    converted: list[str] = []
    for p in todo:
        stem = os.path.splitext(os.path.basename(p))[0]
        convert(spark, p, os.path.join(batch_dir, f"{stem}.parquet"), multi)
        converted.append(p)

    # Commit only after every file in the batch landed (see module note
    # on crash behavior).
    for p in converted:
        seen[p] = _file_key(p)
    manifest["next_batch"] = batch + 1
    _commit_manifest(manifest_path, manifest)
    return IncrementalResult(batch=batch, converted=converted, skipped=skipped)
