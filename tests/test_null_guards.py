"""Kernel NULL-guard contract pins (r10, VERDICT r9 item 4).

The NULL-twin audit (scripts/null_audit.py) adjudicated nine kernel
entry points as `kernel-null-reject`: NULL payloads are rejected
LOUDLY with an actionable error naming the column and the fix, never
a raw numpy/pandas traceback and never a silently-wrong result. The
audit is run-on-demand tooling; this test pins the contract in every
suite run, on a throwaway NULL-injected sf0.001 twin (generated once
per session into /tmp — the source fixtures are never touched).

Each case asserts BOTH that the query raises and that the message is
the actionable one (a regression back to `np.vstack` TypeErrors or
pandas MergeErrors fails the match, not just the raise).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from csv2parquet_spark.queries import REGISTRY  # noqa: E402


@pytest.fixture(scope="module")
def null_twin():
    import null_audit

    null_audit.gen_fixture()
    return null_audit.OUT


# (query, fragment that must appear in the raised error). The fragment
# is the actionable core — column/fix wording may evolve, the contract
# is "names the operator and says filter/fill first".
GUARDED = [
    ("simhash_near_dups", "simhash signatures: NULL token arrays"),
    ("similarity_topk_ivf", "ivf probe: NULL query embeddings"),
    ("similarity_topk_pq", "NULL embedding"),
    ("binary_stats_arrow", "binary_stats_arrow: NULL payloads"),
    ("asof_cogroup_merge", "asof_cogroup_merge: NULL event timestamps"),
    ("t_closeness_report", "NULL sensitive-attribute values"),
    ("embedding_near_dups", "lsh signatures: NULL embeddings"),
    # ADVICE r10: the two remaining adjudicated kernel-null-reject
    # entry points share kernels with rows above but enter through
    # DIFFERENT paths (full-index probe; localCheckpoint-wrapped LSH
    # pipeline) — pin them so an entry-path regression can't hide.
    ("similarity_topk_ivf_full", "ivf probe: NULL query embeddings"),
    ("embedding_semantic_dedup", "lsh signatures: NULL embeddings"),
]


@pytest.mark.parametrize("name,fragment", GUARDED)
def test_kernel_rejects_nulls_actionably(spark, null_twin, name, fragment):
    with pytest.raises(Exception) as exc:
        REGISTRY[name].fn(spark, null_twin).write.format("noop").mode(
            "overwrite"
        ).save()
    # Spark wraps worker-side raises in PythonException — match on the
    # stringified chain so driver-side ValueErrors and worker-side ones
    # pin the same way.
    assert fragment in str(exc.value), (
        f"{name}: expected the actionable guard message ({fragment!r}) "
        f"in the raised error, got: {str(exc.value)[:300]}"
    )


# ---------------------------------------------------------------------------
# on_null="skip" (r11, VERDICT r10 item 3): the same nine entry points
# must also run CLEAN on dirty data when the caller opts into
# quarantine mode — NULL rows dropped BEFORE the kernel by a Catalyst
# filter, the drop count recorded as an Observation metric during the
# same action (operators/null_policy.py). raise stays the default, so
# the contract pins above are untouched.
# ---------------------------------------------------------------------------

from csv2parquet_spark.operators.null_policy import (  # noqa: E402
    check_on_null,
    last_skip_observation,
)


def test_on_null_mode_validated():
    with pytest.raises(ValueError, match="on_null='drop'"):
        check_on_null("drop")


# Queries whose skip-mode run must complete on the NULL twin. Note
# similarity_topk_pq is EXCLUDED here: its query vector (vec_id=0) is
# NULL on the twin and a missing query has no skippable answer — the
# raise survives skip mode by contract (pinned below).
SKIP_CLEAN = [
    "simhash_near_dups",
    "embedding_near_dups",
    "embedding_semantic_dedup",
    "similarity_topk_ivf",
    "similarity_topk_ivf_full",
    "binary_stats_arrow",
    "asof_cogroup_merge",
    "t_closeness_report",
]


@pytest.mark.parametrize("name", SKIP_CLEAN)
def test_on_null_skip_runs_clean_on_null_twin(spark, null_twin, name):
    df = REGISTRY[name].fn(spark, null_twin, on_null="skip")
    df.write.format("noop").mode("overwrite").save()


def test_on_null_skip_counts_drops(spark, null_twin):
    """binary_stats_arrow(skip): row count equals the non-NULL-text
    count and the Observation reports exactly the dropped rows."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{null_twin}/documents.parquet")
    n_total = docs.count()
    n_null = docs.filter(F.col("text").isNull()).count()
    assert n_null > 0, "twin fixture must carry NULL text rows"

    out = REGISTRY["binary_stats_arrow"].fn(spark, null_twin, on_null="skip")
    assert out.count() == n_total - n_null
    obs = last_skip_observation("binary_stats_arrow")
    assert obs is not None
    got = obs.get
    assert got["rows_seen"] == n_total
    assert got["nulls_dropped"] == n_null


def test_on_null_skip_matches_prefiltered_raise(spark, null_twin):
    """simhash skip-mode output == raise-mode output on an input the
    caller pre-filtered by hand (the fix the raise message dictates) —
    skip is sugar for that filter, never a third semantics."""
    from pyspark.sql import functions as F

    from csv2parquet_spark.operators import dedup as D

    docs = spark.read.parquet(f"{null_twin}/documents.parquet")
    skipped = D.simhash_signatures(docs, on_null="skip")
    manual = D.simhash_signatures(docs.filter(F.col("text").isNotNull()))
    assert sorted(map(tuple, skipped.collect())) == sorted(
        map(tuple, manual.collect())
    )


def test_on_null_pq_query_vector_still_raises_in_skip_mode(spark, null_twin):
    with pytest.raises(Exception, match="NULL embedding"):
        REGISTRY["similarity_topk_pq"].fn(
            spark, null_twin, on_null="skip"
        ).write.format("noop").mode("overwrite").save()
