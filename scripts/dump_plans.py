"""Dump `.explain("formatted")` for named registry keys to
plans/<tag>/<key>_<suffix>.txt — the optimization round's before/after
plan evidence (the judge checks plan claims against these files).

    python scripts/dump_plans.py --tag r11 --suffix before key1 key2 ...

Runs NO jobs for purely declarative queries; iterative/guarded queries
may execute their model-sized driver steps (same as any plan walk).
SPARK_GRAFT_DIM_GUARD=0 is set for the process so dimension guards stay
job-free.
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("SPARK_GRAFT_DIM_GUARD", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from csv2parquet_spark.queries import REGISTRY  # noqa: E402
from csv2parquet_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    tag, suffix = "r11", "before"
    keys: list[str] = []
    it = iter(args)
    for a in it:
        if a == "--tag":
            tag = next(it)
        elif a == "--suffix":
            suffix = next(it)
        else:
            keys.append(a)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(
        "dump_plans", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    for name in keys:
        try:
            df = REGISTRY[name].fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — record, don't die
            txt = f"PLAN DUMP FAILED: {exc!r}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")


if __name__ == "__main__":
    main()
