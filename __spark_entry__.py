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

_SHIPPED_SESSIONS: set[str] = set()  # applicationIds already shipped to


def _ship_package(spark: SparkSession) -> None:
    """Make ``csv2parquet_spark`` importable on EXECUTOR Python workers
    regardless of the driver's launch directory: zip the package once
    and ``addPyFile`` it (the standard way to ship Python deps to a
    cluster). Without this, pandas-UDF closures that reference
    module-level helpers (pickled by reference) only resolve when the
    worker's sys.path happens to contain the repo — true when launched
    from /root/repo, not from elsewhere."""
    # Key by applicationId, not id(spark): CPython reuses freed object
    # addresses, so id() could mark a NEW session as already shipped.
    app_id = spark.sparkContext.applicationId
    if app_id in _SHIPPED_SESSIONS:
        return
    import hashlib
    import zipfile

    root = os.path.dirname(os.path.abspath(__file__))
    sources = sorted(
        os.path.join(dirpath, f)
        for dirpath, _dirs, files in os.walk(os.path.join(root, "csv2parquet_spark"))
        for f in files
        if f.endswith(".py")
    )
    # Content-derived name: a code edit yields a NEW zip, so a stale
    # cached archive can never ship old module code next to new driver
    # code (a mismatch that would surface as baffling oracle diffs).
    sig = hashlib.md5()
    for full in sources:
        st = os.stat(full)
        sig.update(f"{os.path.relpath(full, root)}:{st.st_mtime_ns}:{st.st_size}".encode())
    zpath = f"/tmp/csv2parquet_spark_pkg_{sig.hexdigest()[:16]}.zip"
    if not os.path.exists(zpath):
        # per-process temp name: concurrent writers (pytest workers)
        # each build their own file; os.replace is atomic, so whichever
        # rename lands last is a complete archive of the same content
        part = f"{zpath}.{os.getpid()}.part"
        with zipfile.ZipFile(part, "w") as z:
            for full in sources:
                z.write(full, os.path.relpath(full, root))
        os.replace(part, zpath)
    spark.sparkContext.addPyFile(zpath)
    _SHIPPED_SESSIONS.add(app_id)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ship_package(spark)
    return REGISTRY["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2. Each
    callable ships the package to executors on first use (no-op once
    per session) so Python-worker closures resolve from any launch dir."""
    import functools

    def _wrap(fn):
        @functools.wraps(fn)
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ship_package(spark)
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(spec.fn) for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every hash-checked query."""
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
