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

# ---------------------------------------------------------------------------
# Driver-window rotation.
#
# The driver's correctness harness checks roughly the FIRST 50 registry
# entries per round (round 1 covered exactly indices 0-49). To convert the
# remaining local-only queries into driver-verified ones, we rotate: the
# names below register first this round. The first 50 entries:
# the 47 queries the round-1 window never reached (windows, streaming,
# advanced, tpch_extra, chunking/multimodal/grouped llm_ops tail) plus
# three re-proofs for queries whose implementation changed this round
# (array_funcs2 serialization fix, embedding near-dup LSH re-block, IVF
# broadcast-centroid rework). Round 3 should rotate the tpch_more sweep
# (and anything still unproven) to the front.
# ---------------------------------------------------------------------------
_PRIORITY = [
    # re-proofs for round-2 behavior changes
    "array_funcs2",
    "embedding_near_dups",
    "similarity_topk_ivf_full",
    # llm_ops tail (chunking / grouped-pandas / multimodal / retrieval)
    "chunk_documents",
    "chunk_documents_udtf",
    "zscore_chars_by_lang",
    "multimodal_binary_stats",
    "multimodal_features",
    "multimodal_resize_plan",
    "multimodal_frame_sample",
    "multimodal_decode_stub",
    "similarity_two_stage_retrieval",
    "dedup_clusters",
    # window functions + as-of join
    "window_rank_orders",
    "window_lag_lead_order_gaps",
    "window_running_sum",
    "window_ntile_percentiles",
    "window_first_last_nth",
    "window_moving_7day_revenue",
    "asof_purchase_prev_click",
    # streaming (batch-twin checks)
    "stream_tumbling_window",
    "stream_sliding_window",
    "stream_stateful_user_totals",
    "stream_session_windows",
    "funnel_click_to_purchase",
    # advanced relational
    "stats_aggs",
    "percentiles_exact",
    "percentiles_approx",
    "grouping_sets_sql",
    "sql_exists_subquery",
    "sql_scalar_subquery",
    "sql_in_subquery",
    "listagg_sorted",
    "collect_set_sorted",
    "histogram_price_bins",
    "regexp_extract_groups",
    "union_by_name",
    "top_tokens_per_lang",
    "monthly_order_rollup",
    "top_tokens_salted",
    "hll_sketch_distinct",
    "unpivot_order_metrics",
    "setop_except_all_intersect_all",
    # TPC-H extras (q10/q14/q4/q6/q18 + seeded sampling)
    "q10_returned_revenue",
    "q14_promo_revenue_share",
    "q4_priority_order_counts",
    "sample_lineitem_seeded",
    "q6_forecast_revenue",
    "q18_large_orders",
    "sample_stratified_by_status",
    # 51st: first-time oracle (was rows-only in r1) — lands in-window if
    # the driver cap is >50, else round 3.
    "similarity_topk_lsh",
]


def _rotate(priority: list[str]) -> None:
    """Rebuild REGISTRY (insertion-ordered dict) with ``priority`` first."""
    missing = [n for n in priority if n not in REGISTRY]
    if missing:
        raise ValueError(f"priority rotation names missing from registry: {missing}")
    rest = [n for n in REGISTRY if n not in set(priority)]
    ordered = {n: REGISTRY[n] for n in [*priority, *rest]}
    REGISTRY.clear()
    REGISTRY.update(ordered)


_rotate(_PRIORITY)

__all__ = ["REGISTRY", "register"]
