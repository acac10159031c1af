"""Query registry backing the driver's ``queries()`` / ``oracle_sql()``.

Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with an
equivalent ANSI-SQL string DuckDB runs on the same parquet tables. The
driver hashes both results (columns sorted by name, rows order-insensitive)
— so every computed column must carry the SAME alias on both sides, floats
must be stabilized (decimal sums / explicit rounds) identically on both
sides, and timestamps are avoided in outputs in favor of epoch seconds or
date strings.

Entries whose semantics are seed-dependent or not SQL-expressible set
``oracle=None`` → the driver records a weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → rows-only check


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query to the registry.

    ``oracle`` is DuckDB SQL over the pre-registered views
    (region nation customer supplier part orders lineitem events
    documents embeddings).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle)
        return fn

    return deco
