"""``on_null='raise'|'skip'`` policy for the NULL-rejecting kernels.

The nine adjudicated ``kernel-null-reject`` entry points (simhash /
LSH / IVF-probe / PQ / binary-stats / as-of-merge / t-closeness — see
``scripts/null_audit.py`` CLASSES) raise an actionable error by
default: a NULL payload reaching a numpy/pandas/Arrow kernel is a
contract violation, and the silent dtype coercions it used to cause
were the r9 NULL-twin bug class.

At 100 TB that default is the WRONG operational posture for a
pipeline: one NULL embedding out of 10^11 rows killing a 10-hour job
is worse than quarantining the row. So every guarded entry point also
accepts ``on_null="skip"``: NULL rows are dropped BEFORE the kernel by
a declarative Catalyst filter (the exact fix the raise message tells
the user to apply), and the dropped count is recorded as a Spark
``Observation`` metric during the SAME action — no second scan, no
accumulator double-count on task retry (observation metrics come from
the final, successful task set). ``raise`` stays the default so the
loud contract (pinned by tests/test_null_guards.py) is what you get
unless you opted out.

Reading the count: after any action on the returned DataFrame,

    from csv2parquet_spark.operators.null_policy import last_skip_observation
    obs = last_skip_observation("simhash_signatures")
    obs.get  # {'rows_seen': ..., 'nulls_dropped': ...}

The registry per-context so a pipeline composing several skip-mode
operators can report each quarantine separately.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

VALID_MODES = ("raise", "skip")

# ctx -> most recent Observation attached by skip mode. Driver-side
# model-sized state (one small object per operator call), never data.
_LAST_SKIP_OBS: dict[str, Observation] = {}

_seq = itertools.count()


def check_on_null(on_null: str) -> None:
    """Loud validation: a typo like on_null='drop' must not silently
    behave as 'raise'."""
    if on_null not in VALID_MODES:
        raise ValueError(
            f"on_null={on_null!r}: expected one of {VALID_MODES} "
            "('raise' = actionable error when a NULL payload reaches "
            "the kernel; 'skip' = drop NULL rows before the kernel and "
            "record the count as an Observation metric)"
        )


def skip_nulls(df: DataFrame, cols: list[str], ctx: str) -> DataFrame:
    """Drop rows where ANY of ``cols`` is NULL, counting the drops.

    The count rides the query's own action as an ``Observation``
    (named ``{ctx}.on_null_skip#N`` — the suffix keeps names unique
    when one session calls the same operator repeatedly), so the
    quarantine report costs zero extra passes over the data.
    """
    null_any = None
    for c in cols:
        cond = F.col(c).isNull()
        null_any = cond if null_any is None else (null_any | cond)
    obs = Observation(f"{ctx}.on_null_skip#{next(_seq)}")
    _LAST_SKIP_OBS[ctx] = obs
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum(F.when(null_any, 1).otherwise(0)).alias("nulls_dropped"),
    )
    # isNull() is never itself NULL, so plain negation is total.
    return observed.filter(~null_any)


def last_skip_observation(ctx: str) -> Observation | None:
    """The Observation attached by the most recent ``skip_nulls`` call
    for ``ctx`` (None if skip mode was never used for it). ``obs.get``
    blocks until an action on the returned DataFrame completes."""
    return _LAST_SKIP_OBS.get(ctx)
