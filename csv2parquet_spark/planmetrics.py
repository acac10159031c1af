"""Executed-plan metric capture: the box-noise-immune perf signal.

Wall-clock comparisons between rounds need canary normalization because
the bench box drifts 1.5-2.5x between phases; shuffle VOLUME does not —
records written through every Exchange are a pure function of plan
shape and data, deterministic run-to-run (VERDICT r8 item 8). A key
whose shuffle records grow round-over-round changed PLAN, full stop —
this is the signal that would have flagged the r8 ``agg_approx_distinct``
defect (a 16 KB sketch buffer dragged through per-row Expand partial
groups) without needing the sf1 sweep to catch it by wall time.

The noop-write timing path can't provide it: a ``df.write`` executes a
DIFFERENT QueryExecution than ``df``'s own, so its metrics are not
reachable from the handle (round-4 gotcha). Instead the capture runs
the df's OWN executed plan once — ``executedPlan().execute().count()``
drives the full pipeline JVM-side without transferring rows to Python —
then walks that same plan tree (through AQE wrapper and query stages)
summing the Exchange write metrics.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import DataFrame

# Run-varying tokens inside a physical plan string: expression ids
# (`l_orderkey#123`), plan ids (`[plan_id=456]`), and exchange/subquery
# ids (`[id=#78]`) all come from JVM-global counters that differ run to
# run while the plan SHAPE is identical. Strip them before hashing.
_PLAN_ID_NOISE = re.compile(r"#\d+|plan_id=\d+|\[id=[^\]]*\]")


def plan_signature(df: DataFrame, shuffle_partitions: int | None = None) -> str:
    """Hash of ``df``'s STATIC physical plan with run-varying ids
    normalized away — the cheap plan-identity check behind the shuffle
    lint's fast path (VERDICT r9 item 6).

    Shuffle volume is a pure function of (plan, data, conf); on frozen
    data under pinned conf, an UNCHANGED plan string implies an
    unchanged volume, so the lint can skip the full executed-plan
    capture (one complete query run) whenever this signature matches
    the pinned one. Materializing ``executedPlan`` runs NO jobs — the
    signature costs milliseconds where the capture costs the query.

    Same determinism rules as ``executed_shuffle_metrics``: AQE is
    disabled for the materialization (the AdaptiveSparkPlan wrapper
    string mutates as stages finish) and ``shuffle_partitions`` should
    be pinned to the baseline's value (partition counts appear inside
    ``hashpartitioning(...)`` nodes, so a conf drift changes the
    signature — which is correct, because it changes the volume too).
    """
    spark = df.sparkSession
    pins = {"spark.sql.adaptive.enabled": "false"}
    if shuffle_partitions is not None:
        pins["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    prev = {k: spark.conf.get(k, None) for k in pins}
    for k, v in pins.items():
        spark.conf.set(k, v)
    try:
        raw = df._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return hashlib.sha256(_PLAN_ID_NOISE.sub("", raw).encode()).hexdigest()


def executed_shuffle_metrics(
    df: DataFrame, shuffle_partitions: int | None = None
) -> dict[str, int]:
    """Execute ``df``'s plan WITHOUT AQE and return its total shuffle
    write volume: ``{"records": N, "bytes": N}`` summed across every
    ShuffleExchange.

    ``shuffle_partitions`` optionally pins ``spark.sql.shuffle.partitions``
    for the capture (restored after). Shuffle RECORDS depend on it:
    a second-stage partial aggregate runs on the previous shuffle's
    partition count, so more partitions = smaller partials = less
    map-side combining = more records written. A baseline is therefore
    only comparable under the conf it was captured with — the suite
    learned this when a CLI test's ``getOrCreate`` silently flipped the
    shared session from 4 to 32 shuffle partitions and 27 text-heavy
    keys "grew" 20-50% (r9). Lint callers pass the baseline's pinned
    value; one-off callers can omit it.

    AQE is disabled for the capture (and restored after) because AQE
    volumes are RACY, not merely adaptive: independent query stages
    submit in parallel, and when a runtime broadcast conversion wins
    the race against a sibling exchange's submission that exchange is
    cancelled before writing — the same query measured 163 vs 91
    records on back-to-back runs in one session (r9). The STATIC plan
    is the deterministic canonical form the regression lint needs; a
    code change that adds an exchange or bloats what flows through one
    shows up identically in it, while AQE's runtime improvements
    (broadcast conversion, skew splits, coalescing) never change the
    static shape. ``executedPlan`` is materialized lazily inside this
    call, so the toggle applies even to a DataFrame built earlier
    under AQE.

    Executes ONE full run of the query (JVM-side row count, no driver
    transfer) — callers time their own runs separately; this pass is
    for the metric, not the clock. Pass a FRESH DataFrame: metrics
    accumulate per QueryExecution, so re-capturing a handle that
    already ran double-counts.
    """
    rec = 0
    byt = 0

    def walk(node) -> None:
        nonlocal rec, byt
        name = node.getClass().getSimpleName()
        if "ShuffleExchange" in name:
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() == "shuffleRecordsWritten":
                    rec += kv._2().value()
                elif kv._1() == "shuffleBytesWritten":
                    byt += kv._2().value()
        for i in range(node.children().size()):
            walk(node.children().apply(i))
        # Subquery plans (scalar/IN-subquery expressions) hang off the
        # node's EXPRESSIONS, not children() — without this walk an
        # exchange inside a SubqueryExec is invisible to the lint, so a
        # regression that moves work into a subquery would go unseen
        # (ADVICE r9). ReusedSubqueryExec wraps the SAME physical
        # subquery instance another node already owns — skip it or a
        # reused subquery's volume double-counts nondeterministically
        # (reuse pairing depends on dedup order).
        subs = node.subqueries()
        for i in range(subs.size()):
            sub = subs.apply(i)
            if "ReusedSubquery" not in sub.getClass().getSimpleName():
                walk(sub)
        if name == "AdaptiveSparkPlanExec":  # pragma: no cover - AQE off
            walk(node.executedPlan())
        if "QueryStage" in name:  # pragma: no cover - AQE off
            walk(node.plan())

    spark = df.sparkSession
    pins = {"spark.sql.adaptive.enabled": "false"}
    if shuffle_partitions is not None:
        pins["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    prev = {k: spark.conf.get(k, None) for k in pins}
    for k, v in pins.items():
        spark.conf.set(k, v)
    try:
        qe = df._jdf.queryExecution()
        qe.executedPlan().execute().count()
        walk(qe.executedPlan())
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return {"records": int(rec), "bytes": int(byt)}


def kernel_source_hash(fn) -> str:
    """SHA-256 over the source of ``fn``'s defining module plus every
    in-package module it transitively reaches — the UDF-body half of
    the shuffle lint's fast-path identity (ADVICE r10).

    ``plan_signature`` hashes the physical plan STRING, and plans with
    Python kernels (mapInPandas / applyInPandas / ArrowEvalPython —
    pervasive here) show only the UDF's *name*: a kernel-body edit
    that changes emitted row counts leaves the signature untouched, so
    the fast path would silently skip the volume assertion for exactly
    the regression class it exists to catch. Folding in a source hash
    of the query fn's module closure makes any edit anywhere near the
    key's code invalidate the fast path — the full executed capture
    then re-measures the real volume. False invalidations (editing an
    unrelated query in the same module) cost one capture, never a
    missed regression; the pin self-heals at the next baseline regen.

    Closure rule: start at ``fn``'s module; pull in (a) package
    submodules it references, (b) the defining modules of any
    package-level functions/classes it imported; repeat to a fixed
    point. Hash = sha256 over (sorted module name, source bytes).
    """
    import inspect
    import sys as _sys

    pkg = __name__.split(".")[0] + "."
    mod = inspect.getmodule(fn)
    todo = [mod.__name__] if mod is not None else []
    seen: set[str] = set()
    while todo:
        name = todo.pop()
        if name in seen or not name.startswith(pkg):
            continue
        seen.add(name)
        m = _sys.modules.get(name)
        if m is None:
            continue
        for attr in vars(m).values():
            if inspect.ismodule(attr):
                todo.append(getattr(attr, "__name__", ""))
            else:
                owner = getattr(attr, "__module__", None)
                if isinstance(owner, str):
                    todo.append(owner)
    h = hashlib.sha256()
    for name in sorted(seen):
        m = _sys.modules.get(name)
        try:
            src = inspect.getsource(m)
        except (OSError, TypeError):  # pragma: no cover - C/missing src
            src = name
        h.update(name.encode())
        h.update(src.encode())
    return h.hexdigest()
