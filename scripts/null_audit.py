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

Usage: python scripts/null_audit.py [--gen-only] [key ...]
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
    out = {"ok": ok, "total": len(names), "hits": results}
    with open("/tmp/null_audit.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"ok {ok}/{len(names)}; {len(results)} hits -> /tmp/null_audit.json")


if __name__ == "__main__":
    main()
