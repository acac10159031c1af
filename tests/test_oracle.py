"""Every registered query runs against its DuckDB oracle at sf0.001 —
the local twin of the driver's t2 correctness gate. Oracle-less entries
(seed-dependent LSH etc.) are smoke-checked for schema stability and
deterministic re-execution instead.
"""

from __future__ import annotations

import pytest

from csv2parquet_spark.queries import REGISTRY
from tests.conftest import SF_DIR
from tests.oracle_compare import compare, duckdb_conn

ORACLE_CHECKED = [n for n, s in REGISTRY.items() if s.oracle is not None]
ROWS_ONLY = [n for n, s in REGISTRY.items() if s.oracle is None]


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_oracle_match(spark, sf_dir, con, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    problems = compare(df, con, spec.oracle)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_deterministic(spark, sf_dir, name):
    spec = REGISTRY[name]
    df1 = spec.fn(spark, sf_dir)
    rows1 = sorted(map(str, df1.collect()))
    df2 = spec.fn(spark, sf_dir)
    rows2 = sorted(map(str, df2.collect()))
    assert rows1 == rows2, f"{name} not deterministic across runs"
    assert df1.columns == df2.columns
