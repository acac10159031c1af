"""Generate PLANS.md — formatted physical plans of the scale-critical
queries, so the 100 TB design claims (pushdown, pruning, broadcasts,
TakeOrderedAndProject, map-only stages) are inspectable without running
anything. Run: ``python scripts/gen_plans.py``."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from csv2parquet_spark.queries import REGISTRY  # noqa: E402
from csv2parquet_spark.session import get_spark  # noqa: E402

SHOWCASE = [
    ("filter_project",
     "Predicate pushdown + column pruning: both filters reach the "
     "parquet scan (`PushedFilters`), only referenced columns are read "
     "(`ReadSchema`)."),
    ("q1_pricing_summary",
     "Partial aggregation: 9 decimal aggregates combine map-side "
     "(`partial_sum`) before the single hash exchange."),
    ("q10_returned_revenue",
     "Fact-fact join shuffles once on orderkey; customer and nation "
     "broadcast; top-20 is `TakeOrderedAndProject` (no global sort)."),
    ("topk_orders_by_price",
     "Top-k = per-partition heaps + driver merge, never a full sort."),
    ("similarity_topk_exact",
     "Brute-force cosine top-k: the only exchange is broadcasting the "
     "single query vector — one scan, zero shuffles."),
    ("top_tokens_salted",
     "Salted two-phase aggregation: hot keys split across 32 partial "
     "cells, then merged — same result, skew-proof exchange."),
    ("similarity_knn_join",
     "Batch kNN join: `WindowGroupLimit Partial` below the exchange "
     "keeps at most k rows per query per partition — the shuffle never "
     "carries the corpus×queries product."),
    ("q21_waiting_suppliers",
     "EXISTS/NOT-EXISTS as two aggregations over one orderkey exchange; "
     "orders broadcasts into lineitem; top-100 is TakeOrderedAndProject."),
    ("corpus_pipeline_end_to_end",
     "Whole preprocessing flow in one job: map-only quality rules, "
     "`WindowGroupLimit` partial keep-first below the single md5-keyed "
     "dedup exchange, map-only chunk explode, broadcast per-source "
     "summary join."),
    ("count_min_token_counts",
     "Count-Min sketch: partial aggregation collapses each partition to "
     "≤ depth×width counter cells before a kilobyte shuffle; the lookup "
     "broadcasts the 4096-cell sketch."),
    ("tfidf_top_terms",
     "TF-IDF: df reuses the tf aggregate; per-doc top-3 runs as "
     "WindowGroupLimit partial top-k below the exchange."),
    ("interval_bucket_join",
     "Large×large points-in-interval join rewritten as a shuffled EQUI "
     "join on week buckets (interval side exploded into covered "
     "buckets) + exact residual filter — no BroadcastNestedLoopJoin, "
     "no quadratic pair generation."),
    ("inverted_index_postings",
     "Bounded-postings inverted index: one corpus scan; the rank "
     "window and the final aggregate share the tok exchange; postings "
     "are rank-limited BEFORE collect_list so stopword state stays "
     "capped."),
    ("table_diff_digest",
     "Anti-entropy diff: both sides collapse map-side to 64 "
     "(digest, count) cells — the join and filter move kilobytes "
     "regardless of table size."),
    ("timeseries_gapfill_daily",
     "Gap-fill: the calendar is GENERATED from a 1-row broadcast "
     "bounds aggregate (BroadcastNestedLoopJoin of one row), never "
     "scanned; the left join keys on (user_id, day)."),
    ("fuzzy_join_levenshtein",
     "Fuzzy dimension lookup: BroadcastNestedLoopJoin with the "
     "length-band prefilter ahead of the Levenshtein — probes stream "
     "map-side; corpus×corpus fuzzy matching belongs to the blocked "
     "dedup joins instead."),
    ("exact_substr_dup_spans",
     "ExactSubstr coverage: map-only window build, duplicated-window "
     "set keyed on 16-byte md5, span merge a per-document window — "
     "no all-pairs stage, no global sort."),
    ("pack_sequences_greedy",
     "Sequence packing over the two-pass global_cumsum: range exchange "
     "+ in-partition sort before the pinned localCheckpoint, map-only "
     "after — no Window node, no SinglePartition exchange."),
    ("skew_join_salted",
     "Salted equi join: the physical join keys carry __salt, spreading "
     "a hot orderkey over 8 reducer sub-keys; the replicated dimension "
     "is the explode side."),
    ("tfidf_cosine_pairs",
     "All-pairs cosine with the df-cap prefilter: the inverted-index "
     "self-join is keyed on the token AFTER stopword-grade tokens are "
     "dropped, bounding every join group to 64 docs."),
    # round 4
    ("funnel_signup_view_purchase",
     "Ordered funnel: both conditional-min Windows and the per-user "
     "rollup share ONE user_id hash exchange; the final rollup is a "
     "1-row global aggregate with map-side partials."),
    ("paragraph_dedup_rebuild",
     "Paragraph dedup + reassembly: map-only chunk explode, ONE "
     "md5-keyed window for first-occurrence, one doc-keyed rebuild "
     "aggregate — two shuffles, both on synthetic keys."),
    ("bigram_lm_scores",
     "Bigram LM scoring: pairs built map-side (array zip, no join); "
     "the model is two partial aggs off the pair relation; scoring "
     "joins on the (w1,w2) key and reduces per doc."),
    ("image_ahash_near_dups",
     "Image perceptual-hash dedup: map-only synth+decode+hash "
     "(mapInPandas), band explode, candidate self-join keyed on "
     "(band_idx, band_value) — never on pixels; bit_count verify in "
     "Catalyst."),
    ("exact_percentiles_global",
     "Exact global percentiles: two-pass range-partitioned row "
     "numbering (no Window, no SinglePartition sort) + a 4-row "
     "broadcast rank join."),
    ("cdc_merge_apply",
     "MERGE/CDC apply: one key-partitioned full-outer hash join; "
     "delete filter post-join, no second exchange."),
    ("agg_pushdown_footer_stats",
     "Parquet aggregate pushdown: COUNT/MIN/MAX answered from row-group "
     "footer statistics — `PushedAggregation` on the DSv2 scan, "
     "ReadSchema is the aggregate results, zero data pages."),
    ("dpp_partitioned_days",
     "Dynamic partition pruning: the runtime-derived dim broadcast is "
     "injected into the fact scan's `PartitionFilters` as a "
     "`dynamicpruningexpression` — incident days scanned, not history."),
    ("lateral_topk_per_nation",
     "Correlated LATERAL LIMIT decorrelated to `WindowGroupLimit` + a "
     "broadcast dim join — no per-row subquery re-execution."),
    ("roc_auc_exact",
     "Exact ROC-AUC with no per-row ranking: corpus partial-agg on the "
     "quantized score, two-pass cumsum over the model-sized per-score "
     "relation, one global sum."),
    ("hard_negative_mining",
     "Contrastive hard negatives: anchors broadcast with norms, label "
     "filter map-side, `WindowGroupLimit Partial` caps rows per anchor "
     "crossing the exchange."),
    ("runtime_bloom_filter_join",
     "Runtime bloom filter: `bloom_filter_agg` over the selective side "
     "becomes a `BloomFilterMightContain` predicate on the fact scan — "
     "non-matching rows die map-side, BEFORE the shuffle."),
    ("winnowing_fingerprints",
     "Winnowing fingerprints (r6): vectorized numpy kernel via "
     "mapInPandas over the gated round-robin rebalance — NO keyed "
     "exchange; on a real many-split scan the rebalance is a no-op and "
     "the whole operator is map-only."),
    ("lpa_copurchase_communities",
     "LPA communities (r6 rework): basket-bounded pair edges expanded "
     "map-side, the pair aggregation REUSES the repartition(dst) "
     "exchange (HashPartitioning(dst) satisfies the (src,dst) "
     "clustering), supersteps probe the checkpointed edges with "
     "SHUFFLE_HASH state joins — the edges are never re-sorted or "
     "re-exchanged."),
    ("dsir_importance_weights",
     "DSIR scoring: map-side bigram bucketing, a 256-row feature-model "
     "aggregate broadcast back, one per-doc rollup — the corpus never "
     "shuffles by content."),
    ("containment_near_dups",
     "One-sided prefix principle: the contained side's pigeonhole "
     "prefix joins the container side's full shingle relation; exact "
     "intersect verify touches only surviving pairs."),
    ("skyline_parts_frontier",
     "Dominance without a pairwise join: groupBy price compresses to "
     "the candidate set, the two-pass global_running_max supplies the "
     "exclusive prefix max — no Window, no Exchange SinglePartition."),
    ("stratified_sample_exact",
     "Exact per-stratum quota: rank<=k compiles to WindowGroupLimit "
     "with a Partial below the exchange — each map task forwards at "
     "most k rows per stratum."),
    ("isotonic_calibration_exact",
     "Minimax isotonic fit: one corpus partial-agg onto the quantized "
     "score relation; the O(buckets²) pair stage is a broadcast NLJ "
     "with PARTITIONED prefix-max windows."),
    ("mad_outlier_report",
     "Value-compressed robust stats: both median passes walk the "
     "(group, value)→count CDF — the windows never see raw rows."),
    ("spatial_radius_join_grid",
     "Grid-bucketed radius join: both sides bucket into R-sized cells "
     "(query side ×9 neighbor cells map-side), then a plain shuffled "
     "EQUI join on the cell key + exact int64 residual filter — no "
     "BroadcastNestedLoopJoin, candidates bounded by cell occupancy."),
    ("incremental_ingest_latest",
     "Continuous-ingestion reconcile: batch identity parsed from the "
     "file path (no data column), winner set is a file-count-sized "
     "aggregate broadcast back into the scan-sized relation — "
     "last-batch-wins without a data-wide window."),
    ("t_closeness_report",
     "t-closeness EMD: one broadcast dim join + one partial aggregate "
     "to the (class × 5) grid; cumsum windows partition on the QI "
     "class; the 5-row global CDF is literal — no single-partition "
     "stage."),
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("plans")
    lines = [
        "# PLANS — physical plans of the scale-critical queries",
        "",
        f"Generated by `scripts/gen_plans.py` at `{sf_dir}`. The plan",
        "properties asserted in `tests/test_plans.py` are visible here.",
        "",
    ]
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name, why in SHOWCASE:
        df = REGISTRY[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        # keep the tree + scan details; drop the exhaustive per-node I/O
        tree, _, details = plan.partition("\n\n")
        keep = [tree, ""]
        for block in details.split("\n\n"):
            if any(k in block for k in ("Scan parquet", "PushedFilters")):
                keep.append(block)
                keep.append("")
        lines += [f"## {name}", "", why, "", "```", "\n".join(keep).rstrip(), "```", ""]
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"
    )
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
