"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Each query executes its FULL plan via the noop sink (no driver-side
collect — we measure engine time, not result transfer).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from csv2parquet_spark.queries import REGISTRY  # noqa: E402
from csv2parquet_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "filter_project",
    "q3_top_revenue_orders",
    "q5_local_supplier_volume",
    "join_left_outer_order_counts",
    "agg_distinct_counts",
    "window_rank_orders",
    "window_running_sum",
    "topk_orders_by_price",
    "stream_tumbling_window",
    "stream_session_windows",
    "asof_purchase_prev_click",
    "dedup_exact",
    "ngram_jaccard_near_dups",
    "minhash_near_dups",
    "simhash_near_dups",
    "similarity_topk_exact",
    "embedding_near_dups",
    "text_token_stats",
    "doc_fingerprints",
    "json_funcs",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("bench")

    # Warm the JVM/codegen once with the flagship query.
    REGISTRY["q1_pricing_summary"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = REGISTRY[name].fn
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
