"""Grouped Pandas operators (SURVEY.md §2.7): ``applyInPandas`` over a
groupBy — the escape hatch for per-group logic Catalyst can't express.

The example operator (per-group z-score) IS expressible in SQL (window
aggregates), which is exactly why it's the one registered with a DuckDB
oracle: the pandas path gets a hash-checked correctness gate, proving
the Arrow round-trip (types, nulls, grouping) — then the pattern carries
to genuinely non-SQL per-group logic (model scoring, sketches).

Scale note: applyInPandas shuffles each group to one task and
materializes it in pandas — safe when groups are bounded (languages,
tenants, buckets), wrong for unbounded groups. Group cardinality is the
thing to audit before using this at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def grouped_zscore(
    df: DataFrame,
    group_col: str = "lang",
    value_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, group, z): per-group z-score of ``value_col`` via
    applyInPandas (sample std, ddof=1 — matching SQL ``stddev_samp``)."""
    out_schema = f"{id_col} bigint, {group_col} string, z double"

    def zscore(pdf):
        import pandas as pd  # executor-side import

        std = pdf[value_col].std(ddof=1)
        mean = pdf[value_col].mean()
        # SQL semantics, not pandas': stddev_samp is NULL for a
        # single-row group and 0/0 is NULL, never NaN — a NaN here
        # round-trips through Arrow as double NaN and diverges from
        # the windowed-SQL twin (review r8).
        if pd.isna(std) or std == 0:
            # nullable Float64 with pd.NA crosses Arrow as NULL;
            # np.nan in a plain float64 column would stay NaN
            z = pd.array([pd.NA] * len(pdf), dtype="Float64")
        else:
            z = ((pdf[value_col] - mean) / std).round(6)
        return pd.DataFrame(
            {id_col: pdf[id_col], group_col: pdf[group_col], "z": z}
        )

    return df.groupBy(group_col).applyInPandas(zscore, out_schema)
