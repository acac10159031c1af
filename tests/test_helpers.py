"""Unit tests for queries/helpers.py and the tables.py relation memo —
the r12 hardening of shared infrastructure (VERDICT r11 item 7 /
ADVICE r11)."""

from __future__ import annotations

import math

from csv2parquet_spark.queries.helpers import local_result_df, no_aqe


def test_local_result_df_empty_rows(spark):
    """`FROM VALUES` with zero tuples is a ParseException; the helper
    must degrade to a valid empty relation with the declared schema."""
    df = local_result_df(spark, [], "a bigint, b double")
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["a", "b"]


def test_local_result_df_non_finite_floats(spark):
    """repr(inf) is 'inf', which Spark's string→double cast NULLs
    silently — the helper must spell non-finite doubles the way Spark
    parses them."""
    rows = [(1, float("inf")), (2, float("-inf")), (3, float("nan")), (4, 1.5)]
    got = {
        r["a"]: r["b"]
        for r in local_result_df(spark, rows, "a bigint, b double").collect()
    }
    assert got[1] == float("inf")
    assert got[2] == float("-inf")
    assert math.isnan(got[3])
    assert got[4] == 1.5


def test_local_result_df_repr_roundtrip(spark):
    """Finite doubles cross bit-for-bit (string→double is exact IEEE
    nearest of the repr round-trip)."""
    vals = [0.1, 1e-300, 1.7976931348623157e308, -2.2250738585072014e-308]
    rows = [(i, v) for i, v in enumerate(vals)]
    got = {
        r["a"]: r["b"]
        for r in local_result_df(spark, rows, "a bigint, b double").collect()
    }
    for i, v in enumerate(vals):
        assert got[i] == v


def test_no_aqe_restores_setting(spark):
    before = spark.conf.get("spark.sql.adaptive.enabled")
    with no_aqe(spark):
        assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
    assert spark.conf.get("spark.sql.adaptive.enabled") == before


def test_table_memo_bounded(spark, sf_dir, tmp_path):
    """The memo evicts LRU past its bound instead of pinning every
    (session, path, mtime) keyed plan for process lifetime."""
    import shutil

    from csv2parquet_spark import tables

    src = f"{sf_dir}/region.parquet"
    old = dict(tables._TABLE_MEMO)
    try:
        tables._TABLE_MEMO.clear()
        for i in range(70):
            d = tmp_path / f"sf{i}"
            d.mkdir()
            shutil.copy(src, d / "region.parquet")
            tables.table(spark, str(d), "region")
        assert len(tables._TABLE_MEMO) <= 64
    finally:
        tables._TABLE_MEMO.clear()
        tables._TABLE_MEMO.update(old)


def test_table_memo_dir_fixture_invalidation(spark, sf_dir, tmp_path):
    """A file rewritten IN PLACE inside a directory-shaped table must
    miss the memo (the dir's own mtime/size may not change)."""
    import os

    from csv2parquet_spark import tables
    from pyspark.sql import functions as F

    # The loader requires a known table name; drive the memo through a
    # directory-shaped copy of the region fixture.
    rd = tmp_path / "sfdir"
    rd.mkdir()
    tgt = rd / "region.parquet"
    spark.read.parquet(f"{sf_dir}/region.parquet").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tgt))
    df1 = tables.table(spark, str(rd), "region")
    c1 = df1.count()
    # rewrite one contained file in place with different contents,
    # pinning the directory's own stat fields
    st = os.stat(tgt)
    spark.read.parquet(f"{sf_dir}/region.parquet").filter(
        F.col("r_regionkey") < 2
    ).coalesce(1).write.mode("overwrite").parquet(str(tgt))
    os.utime(tgt, ns=(st.st_atime_ns, st.st_mtime_ns))
    df2 = tables.table(spark, str(rd), "region")
    assert df2.count() != c1
