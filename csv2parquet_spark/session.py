"""SparkSession factory.

Defaults are tuned for the local[N] test rig but every knob is chosen to
survive a 1000-executor cluster: AQE on (runtime re-plan, skew-join
splitting, partition coalescing), UTC session timezone (oracle parity and
sanity at scale), Arrow-accelerated Python interchange, and shuffle
partitions sized to the actual parallelism rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "csv2parquet_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default all
    cores). On a real cluster the caller passes its own master / lets
    spark-submit set it; everything else here is cluster-safe.

    CALLER BEWARE when a session already exists in this JVM:
    ``getOrCreate()`` APPLIES the builder's SQL configs to the existing
    session — it does not just return it. A second ``get_spark`` with
    different defaults (e.g. the CLI inside a test process) silently
    retunes the host session's ``spark.sql.shuffle.partitions``, which
    changes plan-volume measurements (smaller partials = less map-side
    combining = more shuffle records; r9 found 27 lint keys "grown"
    20-50% this way). Measurement code must pin the confs it depends on
    (tests/test_shuffle_baseline.py::pinned_conf).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else (os.cpu_count() or 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # Shuffle sized to parallelism; AQE coalesces further at runtime.
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE's coalescer respects parallelism first (default), but its
        # 1m minPartitionSize FLOOR wins on small intermediate shuffles:
        # a ~2 MB aggregated relation coalesces to 1-2 partitions and
        # every downstream window/join stage runs serial while the rest
        # of the machine idles (r11 profiling: mad_outlier_report spent
        # 8 consecutive stages on one task; 2.32 s → 1.44 s with a 64k
        # floor). 64k keeps parallelismFirst able to reach
        # defaultParallelism on small relations; at cluster scale
        # partitions are orders of magnitude above either floor, so the
        # setting is inert there (and tunable via env either way).
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION_SIZE", "64k"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # UTC everywhere: DuckDB oracle timestamps are UTC-naive.
        .config("spark.sql.session.timeZone", "UTC")
        # Parquet TIMESTAMP(NANOS) (events.ts) is otherwise unreadable:
        # surface it as LongType and convert in the table loader.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Arrow batch transfer for pandas UDF / toPandas paths.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
