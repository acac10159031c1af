"""Round-9 tail adjudication probe (VERDICT r8 item 1).

Fresh session, quiet box: times the five frozen canary keys first
(box-speed yardstick vs the pinned r6/r7 driver numbers), then the ten
>1.5x canary-normalized r8 tail keys, each with bench.py's adaptive
best-of-N protocol (warm once, time until the two fastest agree within
min(0.3 s, 30% of best), cap 6). Prints a JSON report.
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

TAIL = [
    "paragraph_dedup_rebuild",
    "image_ahash_near_dups",
    "length_bucket_packing_report",
    "mad_outlier_report",
    "skyline_parts_frontier",
    "rrf_fusion_hybrid",
    "funnel_signup_view_purchase",
    "lateral_topk_per_nation",
    "bigram_lm_scores",
    "embedding_pca_project",
]


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
        "probe_r9", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    REGISTRY["q1_pricing_summary"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    out: dict = {"canary": {}, "tail": {}}
    for name in CANARY_KEYS + TAIL:
        best, n = adaptive(REGISTRY[name].fn, spark, sf_dir)
        sect = "canary" if name in CANARY_KEYS else "tail"
        out[sect][name] = {"best": best, "n_runs": n}
        print(f"{name} {best} n={n}", file=sys.stderr, flush=True)
    for rnd in ("r6", "r7"):
        ratios = [
            out["canary"][k]["best"] / CANARY_REF[rnd][k]
            for k in CANARY_KEYS
            if CANARY_REF[rnd].get(k)
        ]
        out[f"box_ratio_vs_{rnd}"] = round(_median(ratios), 3)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
