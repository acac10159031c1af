"""Round-11 canary-drift adjudication probe (VERDICT r10 item 6).

``containment_near_dups`` was the one canary at raw 1.41x its r8
driver pin in the r10 bench (1.29x relative to the 1.095 canary
median) — the first canary to drift two rounds running. Same isolated
quiet-box protocol as ROUND8 §1 / probe_r9: fresh session, time the
ten frozen canary keys with bench.py's adaptive best-of-N, compute
the box ratio from the OTHER nine canaries vs their r8 driver pins,
then judge containment's normalized ratio. >1.1x normalized =>
bisect against its pinned shuffle volume and plan signature; else box
noise. Prints one JSON report.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from csv2parquet_spark.queries import REGISTRY  # noqa: E402
from csv2parquet_spark.session import get_spark  # noqa: E402

from bench import CANARY_KEYS, CANARY_REF, _median  # noqa: E402

TARGET = "containment_near_dups"


def adaptive(fn, spark, sf_dir) -> tuple[float, int]:
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    runs: list[float] = []
    for _ in range(6):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
        if len(runs) >= 3:
            s = sorted(runs)
            if s[1] - s[0] < min(0.3, 0.3 * s[0]):
                break
    return round(sorted(runs)[0], 3), len(runs)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "probe_r11", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    REGISTRY["q1_pricing_summary"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    ref = CANARY_REF["r8"]
    out: dict = {"canary": {}, "target": TARGET}
    others = []
    for k in CANARY_KEYS:
        sec, n = adaptive(REGISTRY[k].fn, spark, sf_dir)
        ratio = round(sec / ref[k], 3)
        out["canary"][k] = {"sec": sec, "n": n, "r8_pin": ref[k], "ratio": ratio}
        if k != TARGET:
            others.append(ratio)
    box = _median(sorted(others))
    raw = out["canary"][TARGET]["ratio"]
    out["box_ratio_excl_target"] = round(box, 3)
    out["target_raw_ratio"] = raw
    out["target_normalized"] = round(raw / box, 3)
    out["verdict"] = (
        "REGRESSION-CANDIDATE (bisect plan/volume)"
        if raw / box > 1.1
        else "box noise"
    )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
