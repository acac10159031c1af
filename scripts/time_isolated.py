"""Time registry queries in isolation (fresh measurement, warmed codegen).

Usage: python scripts/time_isolated.py name1 name2 ... [--sf-dir DIR]
Prints one line per query: name best_sec (runs...).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from csv2parquet_spark.queries import REGISTRY  # noqa: E402
from csv2parquet_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for a in sys.argv[1:]:
        if a.startswith("--sf-dir="):
            sf_dir = a.split("=", 1)[1]
    spark = get_spark(
        "time_isolated", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    for name in args:
        fn = REGISTRY[name].fn
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        print(name, min(runs), runs, flush=True)


if __name__ == "__main__":
    main()
