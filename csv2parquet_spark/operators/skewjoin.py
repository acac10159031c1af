"""Skew-resilient equi join via key salting — the standard remedy when
one join key is a heavy hitter and a shuffled join would funnel that
key's every row through a single reducer.

``salted_join(big, small, key, r)``: the big side deterministically
salts each row into one of ``r`` sub-keys (xxhash64 of the whole row —
stable across task retries, unlike rand()/monotonic ids); the small
side replicates ``r``-fold with every salt value; the join runs on
``(key, salt)``, spreading a hot key over ``r`` reducers. The salt is
dropped from the output, so results are identical to the unsalted join.

Cost model: small side grows ×r (it must stay the *smaller* side —
replication is the price of splitting the hot key); the big side is
untouched. This composes with AQE skew-join splitting (which only
splits at partition granularity and cannot split ONE key's rows across
reducers in a sort-merge join the way salting can).

The reference (`/root/reference/src/main.rs`) has no join surface;
this is engine-extension scale machinery (SURVEY.md §2.2 joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str | list[str],
    r: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi join of ``big`` ⋈ ``small`` on ``key`` with ``r``-way
    salting of the big side. Supported ``how``: inner / left (the
    directions where the replicated side is the lookup side).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [key] if isinstance(key, str) else list(key)
    if _SALT in big.columns or _SALT in small.columns:
        raise ValueError(f"column {_SALT!r} already present")
    b = big.withColumn(
        _SALT,
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(r)).cast("int"),
    )
    s = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(r - 1)))
    ).withColumn(_SALT, F.col(_SALT).cast("int"))
    return b.join(s, [*keys, _SALT], how).drop(_SALT)
