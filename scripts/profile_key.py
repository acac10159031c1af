"""Per-key stage profiler (guide §1/§7): run HEADLINE keys under a
UI-enabled session and report, per key, the timed best-of-N wall and a
per-stage breakdown from the Spark REST API — task count, total
executor run time, max task time, input bytes and shuffle bytes.

This answers the question wall-clock alone cannot: is a slow key
shuffle-bound, single-task-bound (one parquet row group = one map
task), Python-kernel-bound, or job-count-bound? Usage:

    python scripts/profile_key.py q1_pricing_summary multimodal_resize_real

Writes a JSON report to /tmp/profile_<ts>.json and prints a compact
table. Not part of the bench contract — a measurement tool only.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from csv2parquet_spark.queries import REGISTRY  # noqa: E402
from csv2parquet_spark.session import get_spark  # noqa: E402


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    keys = [a for a in sys.argv[1:] if not a.startswith("-")]
    runs = int(os.environ.get("PROFILE_RUNS", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "profile",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    sc = spark.sparkContext
    base = f"http://localhost:{sc.uiWebUrl.rsplit(':', 1)[1]}/api/v1/applications/{sc.applicationId}" if sc.uiWebUrl else None
    report = {}
    for name in keys:
        fn = REGISTRY[name].fn
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        jobs_before = _api(base, "/jobs") if base else []
        seen = {j["jobId"] for j in jobs_before}
        best, t_last = float("inf"), None
        for i in range(runs):
            sc.setJobDescription(f"{name}#timed{i}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            t_last = time.perf_counter() - t0
            best = min(best, t_last)
        sc.setJobDescription(None)
        # stages of the LAST timed run's jobs only
        jobs = [
            j
            for j in (_api(base, "/jobs") if base else [])
            if j["jobId"] not in seen
            and (j.get("description") or "").startswith(f"{name}#timed{runs-1}")
        ]
        stage_ids = sorted({s for j in jobs for s in j.get("stageIds", [])})
        stages = []
        for sid in stage_ids:
            try:
                infos = _api(base, f"/stages/{sid}")
            except Exception:
                continue
            for si in infos:
                if si.get("status") == "SKIPPED":
                    continue
                stages.append(
                    {
                        "stage": sid,
                        "tasks": si.get("numCompleteTasks"),
                        "exec_run_ms": si.get("executorRunTime"),
                        "input_mb": round((si.get("inputBytes") or 0) / 1e6, 2),
                        "sh_read_mb": round((si.get("shuffleReadBytes") or 0) / 1e6, 2),
                        "sh_write_mb": round((si.get("shuffleWriteBytes") or 0) / 1e6, 2),
                        "name": (si.get("name") or "")[:70],
                    }
                )
        report[name] = {
            "best_sec": round(best, 3),
            "last_sec": round(t_last, 3),
            "n_jobs_last_run": len(jobs),
            "stages_last_run": stages,
        }
        print(f"\n=== {name}: best {best:.3f}s  last {t_last:.3f}s  jobs {len(jobs)}")
        for st in stages:
            print(
                f"  stage {st['stage']:>4} tasks={st['tasks']:>3} "
                f"run={st['exec_run_ms']:>7}ms in={st['input_mb']:>7} "
                f"shR={st['sh_read_mb']:>7} shW={st['sh_write_mb']:>7}  {st['name']}"
            )
    out = f"/tmp/profile_{int(time.time())}.json"
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"\nwritten {out}")


if __name__ == "__main__":
    main()
