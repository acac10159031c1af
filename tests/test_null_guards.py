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
