"""Full-registry driver-protocol pre-flight: every registered query run
as the driver runs it (sf0.01, local[32], Spark vs DuckDB oracle,
sorted-column order-insensitive value compare) and the result recorded
as PREFLIGHT_r{N}.json in the repo root.

This is the cheap local twin of the driver's correctness gate — one run
proves the whole 286-query registry at the driver's own SF before the
driver's ~50-query window samples it (the r8 protocol; see ROUND8.md).

Usage: python scripts/preflight.py <round> [note...]
"""

from __future__ import annotations

import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from csv2parquet_spark.queries import REGISTRY  # noqa: E402
from tests.oracle_compare import compare, duckdb_conn  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    rnd = int(sys.argv[1])
    note = " ".join(sys.argv[2:])
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_conn(SF_DIR)
    ok = 0
    failures: dict[str, str] = {}
    for i, (name, spec) in enumerate(REGISTRY.items(), 1):
        try:
            assert spec.oracle is not None, "rows-only entry"
            problems = compare(spec.fn(spark, SF_DIR), con, spec.oracle)
            if problems:
                failures[name] = "; ".join(problems)[:400]
            else:
                ok += 1
        except Exception:
            failures[name] = traceback.format_exc()[-400:]
        if i % 25 == 0:
            print(f"{i}/{len(REGISTRY)} ok={ok}", file=sys.stderr, flush=True)
    out = {
        "what": (
            "local driver-protocol pre-flight: every registered query run "
            "as the driver runs it (sf0.01, Spark vs DuckDB oracle, "
            "sorted-column value hash)" + (f"; {note}" if note else "")
        ),
        "sf": 0.01,
        "total": len(REGISTRY),
        "hash_match": ok,
        "failures": failures,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"PREFLIGHT_r{rnd:02d}.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}: {ok}/{len(REGISTRY)} hash-match, "
          f"{len(failures)} failures")


if __name__ == "__main__":
    main()
