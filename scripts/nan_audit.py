"""NaN-twin audit: the FLOAT sibling of the NULL-twin audit.

A real 100 TB corpus carries NaNs as well as NULLs (failed feature
extraction, 0/0 upstream, sensor glitches), and NaN is a DIFFERENT
hazard class: both engines treat NaN = NaN as true and sort NaN above
+Inf, but they diverge on NaN→DECIMAL casts (Spark yields NULL,
DuckDB errors under strict casting), NaN in window frames, and NaN
formatting through pandas. This script manufactures the evidence the
same way ``null_audit.py`` does for NULLs: a derived sf0.001 twin
with deterministic NaNs injected into every DOUBLE measure column
(plus element 0 of ~5% of embeddings), then the driver-protocol
compare over every registered query.

First run (r11) is a DISCOVERY pass: hits are recorded UNCLASSIFIED
and the script exits 0 — the artifact is the r12 triage worklist,
exactly how the NULL twin started in r9. Once a ``CLASSES`` map
exists here, the diff gate mirrors null_audit's.

Usage: python scripts/nan_audit.py [--gen-only] [--round N] [key ...]
"""

from __future__ import annotations

import json
import math
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

SRC = "/root/testdata/sf0.001"
OUT = "/tmp/testdata_nansf"

# (primary key, DOUBLE columns receiving NaN). Mask: pk % 17 == j % 17
# (a different modulus than the NULL twin's 19, so the two audits
# perturb different rows and a query passing both saw both hazards).
NAN_COLS = {
    "lineitem": ("l_orderkey", ["l_quantity", "l_extendedprice",
                                 "l_discount", "l_tax"]),
    "orders": ("o_orderkey", ["o_totalprice"]),
    "customer": ("c_custkey", ["c_acctbal"]),
    "supplier": ("s_suppkey", ["s_acctbal"]),
    "part": ("p_partkey", ["p_retailprice"]),
    "events": ("event_id", ["value"]),
}

# Adjudicated classes (fill as hits are triaged, mirroring
# null_audit.CLASSES). Name-level entries win; the pattern classifier
# below catches the mechanical mega-class.
CLASSES: dict[str, str] = {}


def auto_class(detail: str) -> str | None:
    """Pattern-level adjudication for the r11 discovery findings.

    nan-decimal-cast-oracle-strict (91/99 of the discovery hits): the
    engine's decimal-stabilized sum convention (CAST(x AS
    DECIMAL(18,6)) before SUM) hits a NaN — DuckDB's strict cast
    ERRORS ("value is out of range for the destination type
    INT64/INT128") while Spark's non-ANSI cast yields NULL and the
    sum silently skips the row. BOTH behaviors are defensible alone;
    the DIVERGENCE is the finding, and the Spark side is the sharper
    operational hazard (a NaN silently vanishing from a revenue
    total at 100 TB). r12 contract decision: either gate measures
    with nanvl/isnan on both engines, or adopt loud-NaN guards like
    the NULL kernel guards.
    """
    if "can't be cast because the value is out of range" in detail:
        return "nan-decimal-cast-oracle-strict"
    return None


def gen_fixture() -> None:
    import shutil

    os.makedirs(OUT, exist_ok=True)
    for tbl in ("region", "nation", "documents"):
        shutil.copy(os.path.join(SRC, f"{tbl}.parquet"),
                    os.path.join(OUT, f"{tbl}.parquet"))
    for tbl, (pk, cols) in NAN_COLS.items():
        t = pq.read_table(os.path.join(SRC, f"{tbl}.parquet"))
        keys = t[pk].to_numpy()
        for j, c in enumerate(cols):
            mask = (keys % 17) == (j % 17)
            vals = t[c].to_numpy(zero_copy_only=False).astype("float64").copy()
            vals[mask] = math.nan
            idx = t.schema.get_field_index(c)
            t = t.set_column(idx, t.schema.field(c), pa.array(vals, pa.float64()))
        pq.write_table(t, os.path.join(OUT, f"{tbl}.parquet"))
        print(f"{tbl}: NaN'd {cols}", flush=True)
    # embeddings: element 0 of every (vec_id % 17 == 5) vector -> NaN
    t = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    keys = t["vec_id"].to_numpy()
    embs = t["embedding"].to_pylist()
    for i, k in enumerate(keys):
        if k % 17 == 5 and embs[i]:
            embs[i] = [math.nan] + embs[i][1:]
    idx = t.schema.get_field_index("embedding")
    t = t.set_column(
        idx, t.schema.field("embedding"),
        pa.array(embs, t.schema.field("embedding").type),
    )
    pq.write_table(t, os.path.join(OUT, "embeddings.parquet"))
    print("embeddings: NaN'd element 0 of vec_id % 17 == 5", flush=True)


def main() -> None:
    args = sys.argv[1:]
    rnd: int | None = None
    if "--round" in args:
        i = args.index("--round")
        if i + 1 >= len(args) or not args[i + 1].lstrip("-").isdigit():
            sys.exit(
                "usage: nan_audit.py [--gen-only] [--round N] [key ...]"
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
        h["class"] = (
            CLASSES.get(name) or auto_class(h["detail"]) or "UNCLASSIFIED"
        )
    partial = bool(only)
    out = {"ok": ok, "total": len(names), "hits": results,
           "classes_doc": "discovery run — triage into CLASSES "
                          "(scripts/nan_audit.py) as the r12 worklist"}
    if rnd is not None and not partial:
        dest = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            f"NAN_AUDIT_r{rnd:02d}.json",
        )
    else:
        dest = "/tmp/nan_audit.json"
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print(f"ok {ok}/{len(names)}; {len(results)} hits -> {dest}")


if __name__ == "__main__":
    main()
