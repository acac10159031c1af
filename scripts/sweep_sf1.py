"""Full-registry sf0.1 -> sf1 scaling sweep (VERDICT r9 item 3).

Times EVERY registered query at sf0.1 and at the TRUE-dimension sf1
fixture (scripts/make_sf1.py — supplier/region/nation dim-sized, facts
10x), INTERLEAVED PER KEY: each key's two measurements run
back-to-back in one session, so the sf1/sf0.1 ratio is immune to the
box's multi-minute host-noise phases (a phase shifts both numerators
of a key almost equally, where two sequential full sweeps would put
whole phases on one side of the ratio — the r8 sweep's failure mode,
after fixture realism).

Per key: warm once per SF, best-of-2 timed noop-sink runs. The ratio
column is the scaling evidence; the absolute seconds are phase-bound
and NOT comparable across rounds without canary normalization.

Usage: python scripts/sweep_sf1.py OUT.json [key ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from csv2parquet_spark.queries import REGISTRY  # noqa: E402
from csv2parquet_spark.session import get_spark  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = os.environ.get("SF1_DIR", "/tmp/testdata_sf1")


def _best_of(fn, spark, sf_dir: str, n: int = 2) -> float:
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    out_path = sys.argv[1]
    only = set(sys.argv[2:])
    spark = get_spark(
        "sweep_sf1", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    keys = [n for n in sorted(REGISTRY) if not only or n in only]
    rows: dict[str, dict] = {}
    t_start = time.time()
    for i, name in enumerate(keys, 1):
        fn = REGISTRY[name].fn
        try:
            a = _best_of(fn, spark, SF01)
            b = _best_of(fn, spark, SF1)
            rows[name] = {
                "sf0.1_sec": round(a, 3),
                "sf1_sec": round(b, 3),
                "ratio": round(b / a, 2) if a > 0 else None,
            }
        except Exception as exc:  # noqa: BLE001 — record, never abort sweep
            rows[name] = {"error": repr(exc)[:300]}
        print(f"{i}/{len(keys)} {name} {rows[name]}", flush=True)
        # checkpoint the artifact as we go — a crash keeps partial data
        if i % 10 == 0 or i == len(keys):
            with open(out_path, "w") as f:
                json.dump(
                    {
                        "protocol": "per-key interleaved warm+best-of-2, "
                        "one session; ratio is phase-immune, absolute "
                        "seconds are not",
                        "sf1_dir": SF1,
                        "elapsed_sec": round(time.time() - t_start, 1),
                        "keys": rows,
                    },
                    f,
                    indent=1,
                    sort_keys=True,
                )
    done = [r for r in rows.values() if "ratio" in r]
    rats = sorted(r["ratio"] for r in done if r["ratio"] is not None)
    if rats:
        med = rats[len(rats) // 2]
        print(f"median ratio {med}; worst 5: {rats[-5:]}")


if __name__ == "__main__":
    main()
