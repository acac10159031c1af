"""Testdata table loaders.

One parquet file per table under an ``sf_dir`` (see TESTDATA.md). Loaders
return plain DataFrames; column pruning / predicate pushdown then happen
at the parquet scan via Catalyst — callers should select/filter early and
let the optimizer prune the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def ensure_session_confs(spark: SparkSession) -> None:
    """Runtime-settable confs every query depends on, set defensively so
    results are correct even under a caller-provided SparkSession:
    UTC session TZ (timestamp value parity) and nanos-as-long parquet
    reads (events.ts is TIMESTAMP(NANOS), unreadable otherwise)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # Parquet naive timestamps surface as TIMESTAMP_NTZ in Spark 4; with
    # the session pinned to UTC, casting to TIMESTAMP (LTZ) is
    # value-identical and keeps unix_millis / time-window functions
    # applicable. The cast is a zero-cost projection (no data rewrite).
    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, T.TimestampNTZType)]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast(T.TimestampType()))
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # events.ts stored as parquet TIMESTAMP(NANOS) → read as epoch-nanos
        # long (spark.sql.legacy.parquet.nanosAsLong) → truncate to micros.
        # Data generated with TIMESTAMP(MICROS) arrives as a timestamp
        # already (handled by the NTZ cast above) and skips this.
        # FLOOR division, not `ts div 1000`: DIV truncates toward zero,
        # so pre-epoch nanos with a sub-microsecond remainder would
        # round one microsecond LATE (review r8) — the pmod-subtract
        # form is exact floor for either sign (the kappa/grid-cell
        # pattern).
        df = df.withColumn(
            "ts",
            F.timestamp_micros(F.expr("(ts - pmod(ts, 1000)) DIV 1000")),
        )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the SQL-flavored queries)."""
    for name in TABLE_NAMES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
