"""Local re-implementation of the driver's DuckDB-oracle compare:
row-count + column names + order-insensitive value multiset.

Used by tests/test_oracle.py so every registered query is verified at
sf0.001 (and optionally sf0.01) before the driver ever sees it.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

from csv2parquet_spark.tables import TABLE_NAMES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _norm(v: Any) -> Any:
    """Canonicalize a cell for cross-engine comparison.

    List/dict/array cells are REJECTED, mirroring the driver's harness:
    its pandas ``sort_values`` canonicalizer cannot factorize container
    cells (round-1 ``array_funcs2`` hard-fail). Registry queries must
    serialize arrays/structs (``concat_ws`` / ``to_json``) before return,
    so local green predicts driver green.
    """
    if isinstance(v, (list, tuple, dict, set)) or type(v).__name__ == "ndarray":
        raise TypeError(
            f"container-typed cell {type(v).__name__} in query output — "
            "serialize arrays/structs with concat_ws/to_json (driver "
            "canonicalizer cannot hash list cells)"
        )
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # exact: the queries already stabilize floats
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, int):
        return int(v)
    return str(v)


def _rows(df_pandas) -> list[tuple]:
    cols = sorted(df_pandas.columns)
    out = []
    for t in df_pandas[cols].itertuples(index=False, name=None):
        out.append(tuple(_norm(v) for v in t))
    return sorted(out, key=lambda r: tuple((x is None, str(x)) for x in r))


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    sp = spark_df.toPandas()
    dk = con.execute(sql).fetchdf()
    sp_cols, dk_cols = sorted(sp.columns), sorted(dk.columns)
    if sp_cols != dk_cols:
        problems.append(f"columns differ: spark={sp_cols} duckdb={dk_cols}")
        return problems
    if len(sp) != len(dk):
        problems.append(f"row counts differ: spark={len(sp)} duckdb={len(dk)}")
    rs, rd = _rows(sp), _rows(dk)
    if rs != rd:
        only_s = [r for r in rs if r not in rd][:3]
        only_d = [r for r in rd if r not in rs][:3]
        problems.append(
            f"values differ ({len(rs)} vs {len(rd)} rows); "
            f"spark-only sample={only_s}; duckdb-only sample={only_d}"
        )
    return problems
