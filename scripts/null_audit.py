"""NULL-twin audit: run the WHOLE registry against a NULL-injected
fixture, Spark vs DuckDB, and report divergences.

The driver fixtures contain no NULLs in most columns, so any operator
whose Spark formulation deviates structurally from its SQL oracle
(groupBy vs self-join, kernel vs aggregate) can diverge on NULL-key
data without any gate noticing — the r9 ``copurchase_edges`` find
(groupBy lumps NULL keys into one pseudo-basket; a self-equi-join
never matches NULL) is exactly this class. This script manufactures
the missing evidence: a derived sf0.001 twin with deterministic ~5%
NULLs injected into non-primary-key columns, then the driver-protocol
compare over every registered query.

A mismatch here is NOT automatically a bug — Spark and DuckDB differ
legitimately on e.g. NULL sort placement under LIMIT — each hit needs
triage. The value is the worklist.

Since r10 the triage IS the artifact (VERDICT r9 item 4): every hit
carries a class label from the ROUND9.md §9 taxonomy (``CLASSES``
below), the artifact is written to ``NULL_AUDIT_r{N}.json`` at the
repo root when ``--round N`` is given, and the script DIFFS against
the newest prior-round artifact — a hit that is NEW, UNCLASSIFIED,
switched class, or switched kind (mismatch <-> error) exits nonzero,
so a regression inside an "adjudicated-legitimate" class can no longer
hide behind the adjudication.

Usage: python scripts/null_audit.py [--gen-only] [--round N] [key ...]
"""

from __future__ import annotations

import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

SRC = "/root/testdata/sf0.001"
OUT = "/tmp/testdata_nullsf"

# Columns that receive NULLs (primary keys / join identities stay
# non-null: a NULL doc_id or orderkey is out of every contract). The
# mask is deterministic: row is NULLed when (pk % 19) == hash-offset.
NULL_COLS = {
    "lineitem": ("l_orderkey", ["l_suppkey", "l_quantity", "l_discount",
                                 "l_returnflag", "l_shipdate", "l_tax"]),
    "orders": ("o_orderkey", ["o_custkey", "o_totalprice", "o_orderdate",
                               "o_orderpriority"]),
    "customer": ("c_custkey", ["c_name", "c_nationkey", "c_acctbal",
                                "c_mktsegment"]),
    "supplier": ("s_suppkey", ["s_name", "s_acctbal"]),
    "part": ("p_partkey", ["p_name", "p_brand", "p_type", "p_size",
                            "p_retailprice"]),
    "events": ("event_id", ["user_id", "event_type", "value", "props",
                             "ts"]),
    "documents": ("doc_id", ["text", "lang", "source", "n_chars"]),
    "embeddings": ("vec_id", ["embedding", "label"]),
}


# ---------------------------------------------------------------------------
# Per-hit adjudication (ROUND9.md §9 triage, made machine-readable).
# Classes:
#   guard-loud         r8/r9 NULL guards raising actionable errors BY DESIGN
#                      (global_cumsum / global_running_max / exact_median):
#                      loud beats the silent INT64_MIN poisoning they replaced.
#   kernel-null-reject numpy/pandas kernels reject NULL payloads with an
#                      actionable error (r10: wrapped raw tracebacks) — loud,
#                      not silent-wrong; callers fill/filter first.
#   null-sort-order    Spark sorts ASC NULLS FIRST, DuckDB NULLS LAST: ties,
#                      LIMIT boundaries, window frames and lag/lead pick
#                      different rows when NULL keys reach a boundary.
#   null-vs-empty-str  function-semantics differences around NULL vs '':
#                      concat_ws swallows NULLs where string_agg returns NULL,
#                      md5('') vs md5(NULL), split/regexp on NULL text.
#   null-ts-window     Spark's window()/session rewrites add `ts IS NOT NULL`
#                      (a NULL time has no window); DuckDB time_bucket(NULL)
#                      emits a NULL bucket row — row sets differ by design.
#   oracle-loose       the SQL oracle assumes the NULL-free fixture (e.g.
#                      counts NULL props it never shreds); Spark's answer is
#                      the defensible one, oracle kept for the driver fixture.
#   float-downstream   stats (mean/stddev/median/NaN formatting) computed
#                      over a population already shifted by one of the above
#                      classes — the divergence is inherited, not new.
# A name absent from this map that produces a hit is UNCLASSIFIED and
# fails the audit until a human adjudicates it into a class.
CLASSES: dict[str, str] = {
    # guard-loud: the 7 global-order/median guard sites
    "pps_systematic_sample": "guard-loud",
    "cusum_changepoint_daily": "guard-loud",
    "pack_sequences_greedy": "guard-loud",
    "roc_auc_exact": "guard-loud",
    "isotonic_calibration_exact": "guard-loud",
    "theil_sen_daily_trend": "guard-loud",
    "skyline_parts_frontier": "guard-loud",
    # kernel-null-reject: the 9 numpy/pandas kernel entry points
    "simhash_near_dups": "kernel-null-reject",
    "embedding_near_dups": "kernel-null-reject",
    "similarity_topk_ivf": "kernel-null-reject",
    "similarity_topk_ivf_full": "kernel-null-reject",
    "similarity_topk_pq": "kernel-null-reject",
    "embedding_semantic_dedup": "kernel-null-reject",
    "binary_stats_arrow": "kernel-null-reject",
    "asof_cogroup_merge": "kernel-null-reject",
    "t_closeness_report": "kernel-null-reject",
    # null-ts-window: streaming twins + time-bucketed aggregations
    "stream_tumbling_window": "null-ts-window",
    "stream_sliding_window": "null-ts-window",
    "stream_session_windows": "null-ts-window",
    "stream_static_enrich": "null-ts-window",
    "stream_topk_trending": "null-ts-window",
    "stream_dedup_within_watermark": "null-ts-window",
    "error_burst_windows": "null-ts-window",
    "sessionize_events_gap": "null-ts-window",
    "sessionize_dynamic_gap": "null-ts-window",
    "timeseries_gapfill_daily": "null-ts-window",
    "ohlc_hourly_bars": "null-ts-window",
    "attribution_last_click": "null-ts-window",
    # null-sort-order: windows / as-of / top-k with NULL keys at boundaries
    "window_lag_lead_order_gaps": "null-sort-order",
    "window_ntile_scalable": "null-sort-order",
    "window_first_last_nth": "null-sort-order",
    "asof_purchase_prev_click": "null-sort-order",
    "asof_purchase_nearest_click": "null-sort-order",
    "top_event_trigrams": "null-sort-order",
    "event_transition_bigrams": "null-sort-order",
    "ewma_user_value": "null-sort-order",
    "stock_running_balance": "null-sort-order",
    "km_reorder_survival": "null-sort-order",
    "scd2_user_tier_history": "null-sort-order",
    "rrf_fusion_hybrid": "null-sort-order",
    "mom_revenue_growth": "null-sort-order",
    "incremental_dedup_report": "null-sort-order",
    # null-vs-empty-str: string/hash/chunking function semantics
    "string_funcs": "null-vs-empty-str",
    "map_funcs": "null-vs-empty-str",
    "array_funcs2": "null-vs-empty-str",
    "try_funcs": "null-vs-empty-str",
    "listagg_sorted": "null-vs-empty-str",
    "chunk_documents": "null-vs-empty-str",
    "chunk_documents_udtf": "null-vs-empty-str",
    "doc_fingerprints": "null-vs-empty-str",
    "winnowing_fingerprints": "null-vs-empty-str",
    "lang_id_heuristic": "null-vs-empty-str",
    # oracle-loose: the SQL side assumes the NULL-free fixture
    "variant_explode_props": "oracle-loose",
    "corpus_pipeline_end_to_end": "oracle-loose",
    "url_canonical_dedup": "oracle-loose",
    "merge_schema_evolution_read": "oracle-loose",
    "lang_id_agreement_kappa": "oracle-loose",
    "table_diff_digest": "oracle-loose",
    "length_bucket_packing_report": "oracle-loose",
    "q12_late_shipment_priority": "oracle-loose",
    "collation_case_insensitive": "oracle-loose",
    # float-downstream: stats over populations shifted by classes above
    "percentiles_approx": "float-downstream",
    "grouped_percentiles_exact": "float-downstream",
    "kmeans_train_clusters": "float-downstream",
    "label_centroid_separation": "float-downstream",
    "kmv_quantile_sketch": "float-downstream",
    "mad_outlier_report": "float-downstream",
    "ks_test_two_sample": "float-downstream",
    "mann_whitney_u_test": "float-downstream",
    "woe_iv_value_bins": "float-downstream",
    "rfm_customer_segments": "float-downstream",
}


def _latest_prior_artifact(before_round: int | None) -> tuple[str, dict] | None:
    """Newest committed NULL_AUDIT_r{N}.json (below ``before_round``)."""
    import glob
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    best: tuple[int, str] | None = None
    for p in glob.glob(os.path.join(root, "NULL_AUDIT_r*.json")):
        m = re.search(r"_r(\d+)\.json$", p)
        if not m:
            continue
        n = int(m.group(1))
        if before_round is not None and n >= before_round:
            continue
        if best is None or n > best[0]:
            best = (n, p)
    if best is None:
        return None
    with open(best[1]) as f:
        return best[1], json.load(f)


def diff_vs_prior(hits: dict, rnd: int | None) -> tuple[dict, list[str]]:
    """Compare this run's classified hits against the prior artifact.

    Flags (each a loud failure): UNCLASSIFIED hits, NEW hits (a query
    that was NULL-clean starting to diverge is a behavior change even
    if its name has a class in the map), class flips, and kind flips
    (a mismatch turning into an error — or back — inside an
    adjudicated class is exactly the invisible-regression the verdict
    called out). Resolved hits are informational only.
    """
    prior = _latest_prior_artifact(rnd)
    out: dict = {"prior_artifact": prior[0] if prior else None}
    flags: list[str] = []
    for name, h in hits.items():
        if h["class"] == "UNCLASSIFIED":
            flags.append(f"UNCLASSIFIED hit: {name} ({h['kind']})")
    if prior is None:
        return out, flags
    phits = prior[1].get("hits", {})
    new = sorted(set(hits) - set(phits))
    resolved = sorted(set(phits) - set(hits))
    changed = []
    for name in set(hits) & set(phits):
        pc = phits[name].get("class")  # r9 artifact carries no classes
        if pc is not None and pc != hits[name]["class"]:
            changed.append(f"{name}: class {pc} -> {hits[name]['class']}")
        if phits[name]["kind"] != hits[name]["kind"]:
            changed.append(
                f"{name}: kind {phits[name]['kind']} -> {hits[name]['kind']}"
            )
    out.update({"new_hits": new, "resolved_hits": resolved,
                "changed": sorted(changed)})
    flags += [f"NEW hit vs prior: {n}" for n in new]
    flags += [f"CHANGED vs prior: {c}" for c in sorted(changed)]
    # A resolved hit in a DELIBERATE-raise class is itself a behavior
    # change worth a loud flag (ADVICE r10): guard-loud and
    # kernel-null-reject hits exist BECAUSE the guard raises on the
    # NULL twin — one "resolving" means the guard stopped firing, which
    # is a regression unless the kernel grew a real (tested) NULL
    # contract this round. Other classes resolving is the intended
    # burn-down and stays informational.
    for name in resolved:
        pc = phits[name].get("class")
        if pc in ("guard-loud", "kernel-null-reject"):
            flags.append(
                f"RESOLVED {pc} hit: {name} — its guard no longer fires "
                "on the NULL twin; verify a tested NULL contract "
                "replaced it before committing"
            )
    return out, flags


def gen_fixture() -> None:
    import shutil

    os.makedirs(OUT, exist_ok=True)
    for tbl in ("region", "nation"):
        shutil.copy(os.path.join(SRC, f"{tbl}.parquet"),
                    os.path.join(OUT, f"{tbl}.parquet"))
    for tbl, (pk, cols) in NULL_COLS.items():
        t = pq.read_table(os.path.join(SRC, f"{tbl}.parquet"))
        keys = t[pk].to_numpy()
        for j, c in enumerate(cols):
            mask = pa.array((keys % 19) == (j % 19))
            idx = t.schema.get_field_index(c)
            nulled = pa.compute.if_else(
                mask, pa.nulls(len(t), type=t.schema.field(c).type), t[c]
            )
            t = t.set_column(idx, t.schema.field(c), nulled)
        pq.write_table(t, os.path.join(OUT, f"{tbl}.parquet"))
        print(f"{tbl}: nulled {cols}", flush=True)


def main() -> None:
    args = sys.argv[1:]
    rnd: int | None = None
    if "--round" in args:
        i = args.index("--round")
        # Validate loudly (ADVICE r10): a missing/non-integer value used
        # to die with a bare IndexError/ValueError.
        if i + 1 >= len(args) or not args[i + 1].lstrip("-").isdigit():
            sys.exit(
                "usage: null_audit.py [--gen-only] [--round N] [key ...]"
                " — --round requires an integer round number"
            )
        rnd = int(args[i + 1])
        args = args[:i] + args[i + 2:]
    gen_fixture()
    if "--gen-only" in args:
        return
    only = {a for a in args if not a.startswith("--")}

    from pyspark.sql import SparkSession

    from csv2parquet_spark.queries import REGISTRY
    from tests.oracle_compare import compare, duckdb_conn

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_conn(OUT)
    ok, results = 0, {}
    names = [n for n in REGISTRY if not only or n in only]
    for i, name in enumerate(names, 1):
        spec = REGISTRY[name]
        try:
            problems = compare(spec.fn(spark, OUT), con, spec.oracle)
            if problems:
                results[name] = {"kind": "mismatch",
                                 "detail": "; ".join(problems)[:500]}
            else:
                ok += 1
        except Exception as exc:  # noqa: BLE001 — audit records everything
            results[name] = {
                "kind": "error",
                "detail": (repr(exc)[:200] + " | "
                           + traceback.format_exc()[-300:]),
            }
        if i % 25 == 0:
            print(f"{i}/{len(names)} ok={ok}", file=sys.stderr, flush=True)
    for name, h in results.items():
        h["class"] = CLASSES.get(name, "UNCLASSIFIED")
    # Partial runs (explicit key args) never write a round artifact or
    # diff — a 3-key run would otherwise "resolve" the other 68 hits.
    partial = bool(only)
    diff, flags = ({}, []) if partial else diff_vs_prior(results, rnd)
    out = {"ok": ok, "total": len(names), "hits": results,
           "classes_doc": "see CLASSES in scripts/null_audit.py",
           "diff_vs_prior": diff, "flags": flags}
    if rnd is not None and not partial:
        dest = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            f"NULL_AUDIT_r{rnd:02d}.json",
        )
    else:
        dest = "/tmp/null_audit.json"
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print(f"ok {ok}/{len(names)}; {len(results)} hits -> {dest}")
    if flags:
        print("AUDIT FLAGS (investigate before committing):")
        for fl in flags:
            print(f"  - {fl}")
        sys.exit(1)


if __name__ == "__main__":
    main()
