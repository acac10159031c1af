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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

_WORDS = (
    "spark data query join filter group sort merge scan table row column "
    "batch stream window hash key value fast slow big small the a"
).split()


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _Reader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.n_docs = int(options.get("n_docs", 1000))
        self.n_parts = int(options.get("partitions", 8))

    def partitions(self):
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
