"""A custom PARTITIONED Python DataSource (the Spark 4 DataSource API,
SPARK-44076): a deterministic synthetic document generator.

Why it exists: the reference's only source is a local CSV file
(`/root/reference/src/main.rs:124`); real pipelines also ingest from
generators, APIs, and bespoke formats. The Python DataSource API is
Spark's sanctioned way to add those WITHOUT a JVM connector — the
planner asks the source for partitions, ships one task per partition,
and streams Arrow batches back, so a custom source scales exactly like
a file scan (N partitions = N parallel tasks, no driver funnel).

``spark.read.format("synthetic_docs").option("n_docs", ...).load()``
after ``spark.dataSource.register(SyntheticDocsDataSource)``.

Determinism contract: doc i's content depends only on i (multiplicative
hash), never on partitioning — tests pin that any partition count
yields the identical corpus, which is what makes generator sources
replayable/resumable at scale.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

_WORDS = (
    "spark data query join filter group sort merge scan table row column "
    "batch stream window hash key value fast slow big small the a"
).split()


class _Range(InputPartition):
    """Half-open row-index range; shared by the batch and stream readers."""

    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _Reader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.n_docs = int(options.get("n_docs", 1000))
        self.n_parts = int(options.get("partitions", 8))

    def partitions(self):
        if self.n_docs <= 0:
            # n_docs=0 is a legal empty corpus; without the guard the
            # ceil-div yields step 0 and range() raises at plan time.
            return [_Range(0, 0)]
        per = -(-self.n_docs // self.n_parts)
        return [
            _Range(i, min(i + per, self.n_docs))
            for i in range(0, self.n_docs, per)
        ]

    def read(self, part: _Range):
        for i in range(part.start, part.end):
            h = (i * 2654435761) & 0xFFFFFFFF
            n = 20 + h % 80
            toks = [
                _WORDS[((i * 31 + j) * 2654435761 >> 7) % len(_WORDS)]
                for j in range(n)
            ]
            text = " ".join(toks)
            yield (i, text, len(text))


class SyntheticDocsDataSource(DataSource):
    """format name: ``synthetic_docs``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, text string, n_chars int"

    def reader(self, schema: StructType) -> DataSourceReader:
        return _Reader(schema, self.options)


class _StreamReader(DataSourceStreamReader):
    """Offset-based micro-batch reader: offset = how many events have
    ever been emitted. Each ``latestOffset`` call advances by
    ``rows_per_batch`` up to ``max_rows`` — a deterministic replayable
    event stream (content is a pure function of the row index, exactly
    like the batch reader), so checkpoint recovery replays identical
    batches. ``partitions(start, end)`` splits the batch range across
    ``partitions`` tasks — the planner runs them in parallel just like
    a file source's splits.

    Restart safety: ``_latest`` starts at 0 in a fresh reader instance,
    but after checkpoint recovery Spark replays the committed range by
    calling ``partitions(start, end)`` / ``commit(end)`` with offsets
    from the WAL — both bump ``_latest`` to at least that end, so the
    next ``latestOffset`` resumes monotonically from the recovered
    position instead of re-announcing offsets below the committed start
    (which would invert the batch range and later re-emit rows)."""

    def __init__(self, options: dict):
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.max_rows = int(options.get("max_rows", 1000))
        self.n_parts = int(options.get("partitions", 4))
        self._latest = 0

    def initialOffset(self):
        return {"offset": 0}

    def latestOffset(self):
        self._latest = min(self._latest + self.rows_per_batch, self.max_rows)
        return {"offset": self._latest}

    def partitions(self, start: dict, end: dict):
        s, e = start["offset"], end["offset"]
        # Recovery path: never let announced offsets regress below a
        # range the engine already planned (see class docstring). The
        # START offset counts too: after a fully-committed restart the
        # engine may call latestOffset() first (counter still 0) and
        # then plan (committed_start, small_latest) — s > e yields an
        # empty range below, and bumping to s makes the NEXT
        # latestOffset resume from the committed position instead of
        # burning ticks climbing back.
        self._latest = max(self._latest, s, e)
        if s >= e:
            return [_Range(s, s)]
        per = -(-(e - s) // self.n_parts)
        return [_Range(i, min(i + per, e)) for i in range(s, e, per)]

    def read(self, part: _Range):
        for i in range(part.start, part.end):
            h = (i * 2654435761) & 0xFFFFFFFF
            yield (i, h % 100, float(h % 1000) / 10.0)

    def commit(self, end: dict) -> None:
        # Offsets are pure functions of the index: nothing to GC. Track
        # the committed high-water mark for restart monotonicity.
        self._latest = max(self._latest, end["offset"])


class SyntheticEventsStreamDataSource(DataSource):
    """format name: ``synthetic_events_stream`` — register with
    ``spark.dataSource.register`` then ``spark.readStream.format(...)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events_stream"

    def schema(self) -> str:
        return "seq bigint, user_id int, value double"

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return _StreamReader(self.options)


class _JsonlCommit(WriterCommitMessage):
    def __init__(self, path: str, n_rows: int):
        self.path = path
        self.n_rows = n_rows


class _JsonlArrowWriter(DataSourceArrowWriter):
    """Arrow-batched partition writer (the fast path — batches arrive as
    pyarrow RecordBatches, never row-at-a-time Python): each partition
    writes ONE temp-named JSONL file and reports (path, rows) in its
    commit message; nothing is visible until commit()."""

    def __init__(self, path: str, overwrite: bool = False):
        self.path = path
        self.overwrite = overwrite

    def write(self, iterator):
        import json as _json
        import os
        import uuid

        from pyspark import TaskContext

        os.makedirs(self.path, exist_ok=True)
        pid = TaskContext.get().partitionId()
        tmp = os.path.join(self.path, f".part-{pid}-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w") as f:
            for batch in iterator:
                for rec in batch.to_pylist():
                    f.write(_json.dumps(rec, default=str) + "\n")
                    n += 1
        final = os.path.join(self.path, f"part-{pid:05d}-{uuid.uuid4().hex}.jsonl")
        os.rename(tmp, final)
        return _JsonlCommit(final, n)

    def commit(self, messages):
        import glob as _glob
        import json as _json
        import os

        files = sorted(
            os.path.basename(m.path) for m in messages if m is not None
        )
        if self.overwrite:
            # mode("overwrite") must actually clear prior data, or a
            # glob reader sees old+new while the manifest claims only
            # new (review r8). Deferred to COMMIT so an aborted
            # overwrite leaves the previous data intact.
            keep = set(files)
            for p in _glob.glob(os.path.join(self.path, "part-*.jsonl")):
                if os.path.basename(p) not in keep:
                    os.remove(p)
        manifest = {
            "files": files,
            "n_rows": sum(m.n_rows for m in messages if m is not None),
        }
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as f:
            _json.dump(manifest, f)

    def abort(self, messages):
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class _JsonlStreamWriter(DataSourceStreamWriter):
    """Streaming twin: same per-partition JSONL files, one manifest per
    micro-batch (``_MANIFEST-<batchId>.json``) — commit(batchId) is the
    exactly-once hook: a restarted query re-commits the same batch id,
    overwriting the manifest idempotently rather than double-counting."""

    def __init__(self, path: str):
        self.path = path

    def write(self, iterator):
        import json as _json
        import os
        import uuid

        from pyspark import TaskContext

        os.makedirs(self.path, exist_ok=True)
        pid = TaskContext.get().partitionId()
        # dot-tmp + rename, same as the batch writer: a task killed
        # mid-write must not leave a half-written file under a VISIBLE
        # part name (its commit message never reaches abort(), so
        # nothing else would clean it up — review r8).
        tmp = os.path.join(self.path, f".part-{pid}-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(_json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        final = os.path.join(self.path, f"part-{pid:05d}-{uuid.uuid4().hex}.jsonl")
        os.rename(tmp, final)
        return _JsonlCommit(final, n)

    def commit(self, messages, batchId):
        import json as _json
        import os

        manifest = {
            "batch_id": batchId,
            "files": sorted(
                os.path.basename(m.path) for m in messages if m is not None
            ),
            "n_rows": sum(m.n_rows for m in messages if m is not None),
        }
        with open(
            os.path.join(self.path, f"_MANIFEST-{batchId}.json"), "w"
        ) as f:
            _json.dump(manifest, f)

    def abort(self, messages, batchId):
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class JsonlAuditDataSource(DataSource):
    """format name: ``jsonl_audit`` — a pure-Python SINK completing the
    DataSource surface (the readers above cover batch + streaming in):
    every partition writes its own JSONL file, a `_MANIFEST.json`
    records the committed file set and row count (write-visible-only-
    after-commit, the object-store pattern), and the streaming variant
    keys manifests by batch id so replays are idempotent.

    ``df.write.format("jsonl_audit").option("path", ...).mode("append")
    .save()`` after ``spark.dataSource.register(JsonlAuditDataSource)``;
    same format name works under ``writeStream``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_audit"

    def writer(self, schema: StructType, overwrite: bool):
        return _JsonlArrowWriter(self.options["path"], overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool):
        return _JsonlStreamWriter(self.options["path"])
