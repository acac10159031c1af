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
# Round-5: the r4 re-proofs came back green (CORRECTNESS_r04.json).
# One behavior-adjacent change this round: connected_components'
# fixpoint check moved into the checkpoint materialization job
# (observe-based — one pass per round instead of two); results are
# property-test-identical but the executed plan changed, so the one
# proven consumer re-proves.
_FORCE_FIRST: list[str] = ["dedup_clusters"]

# Round-5: cleared at round start per the rotation protocol (VERDICT r4
# item 1) — the 44 never-driver-proven round-4 queries auto-promote to
# tier 1 and fill this round's window. New round-5 registrations go
# here so they can't displace the pending proofs; they fill trailing
# slots if tier 0+1+2 < 50 and auto-promote next round.
_DEFER_THIS_ROUND: set[str] = {
    "dsir_importance_weights",
    "dedup_keep_best_quality",
    "stream_dedup_within_watermark",
    "runtime_bloom_filter_join",
    # second/third wave — behind the four above; auto-promote next round
    "containment_near_dups",
    "k_anonymity_report",
    "crawl_budget_largest_remainder",
    "content_defined_chunks",
    "source_overlap_matrix",
    "bootstrap_ci_revenue",
    "ab_test_revenue_ztest",
    "cusum_changepoint_daily",
    "sessionize_dynamic_gap",
    "psi_price_drift",
    "backtest_seasonal_naive",
    # fourth wave
    "skyline_parts_frontier",
    "mad_outlier_report",
    "rrf_fusion_hybrid",
    "mmr_diversify_topk",
    "merge_schema_evolution_read",
    "woe_iv_value_bins",
    "l_diversity_report",
    "stratified_sample_exact",
    "lpa_copurchase_communities",
    "isotonic_calibration_exact",
    "jackknife_ratio_ci",
    "km_reorder_survival",
    "theil_sen_daily_trend",
    "mann_whitney_u_test",
    "kendall_tau_b_bands",
    "acf_daily_revenue",
    "anomaly_days_seasonal_mad",
    "conformal_interval_daily",
    "zipf_fit_tokens",
    "bfs_hops_copurchase",
    "frequent_triples_apriori",
    "ks_test_two_sample",
    "revenue_concentration_report",
    "mutual_information_bands",
    "cuped_adjusted_ab_test",
    "spearman_rank_correlation",
    "odds_ratio_2x2",
}

# Within the deferred tier, these names sort FIRST (list order) so
# trailing window slots go to the round's flagship additions. Tier 1
# holds 45 names this round (the r4 backlog + the pca conversion), so
# ~4 trailing slots reach these.
_DEFER_PRIORITY: list[str] = [
    "dsir_importance_weights",
    "dedup_keep_best_quality",
    "runtime_bloom_filter_join",
    "stream_dedup_within_watermark",
]


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
