"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship TPC-H-Q1-shaped aggregation at
sf0.001; ``queries()`` / ``oracle_sql()`` expose the full registry from
``csv2parquet_spark.queries`` (one entry per operator declared in
SURVEY.md §2; oracle omitted for seed-dependent / non-SQL ops → the
driver records a rows-only check for those).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from csv2parquet_spark.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every hash-checked query."""
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
