"""Property-based tests (hypothesis) for the sweep-line peak-
concurrency operator: on ARBITRARY interval sets, the plain per-day
window shape and the (day, bucket) shard-with-carry skew hatch must
both equal an independent pure-Python brute force — including the
half-open tie rule (an interval ending exactly where another starts
never double-counts) and days whose intervals all nest, touch, or
cross shard-bucket boundaries.
"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

DAY0 = datetime.date(2024, 3, 1)

INTERVALS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),        # day index
        st.integers(min_value=0, max_value=86_399),   # start second-of-day
        st.integers(min_value=1, max_value=7_200),    # duration seconds
    ),
    min_size=0,
    max_size=60,
)


def _brute(ivs):
    """Per day: peak concurrency of half-open [s, s+dur) intervals.

    With half-open intervals the maximum is attained at some interval's
    START, so evaluating |{i : s_i <= t < e_i}| at every start is exact.
    """
    by_day: dict[int, list[tuple[int, int]]] = {}
    for d, s, dur in ivs:
        by_day.setdefault(d, []).append((s, s + dur))
    out = {}
    for d, spans in by_day.items():
        peak = max(
            sum(1 for s2, e2 in spans if s2 <= t < e2) for t, _ in spans
        )
        out[d] = (len(spans), peak)
    return out


@given(ivs=INTERVALS)
@SETTINGS
def test_sweep_line_matches_bruteforce_plain_and_sharded(spark, ivs):
    from pyspark.sql import functions as F

    from csv2parquet_spark.operators.ranking import sweep_line_daily_peaks

    if not ivs:
        return
    rows = []
    for d, s, dur in ivs:
        day = DAY0 + datetime.timedelta(days=d)
        start = datetime.datetime(day.year, day.month, day.day) + datetime.timedelta(
            seconds=s
        )
        rows.append((day, start, start + datetime.timedelta(seconds=dur)))
    iv = spark.createDataFrame(rows, "day date, s timestamp, e timestamp")
    want = _brute(ivs)

    for kwargs in ({}, {"shard_buckets": 5}, {"shard_buckets": 48}):
        got = {
            (r.day - DAY0).days: (r.n_events, r.peak_concurrency)
            for r in sweep_line_daily_peaks(iv, **kwargs).collect()
        }
        assert got == want, (kwargs, got, want)
