"""Property tests: operator semantics vs pure-Python reference models.

The reference's doctests fix single examples; these check the same
semantics hold for arbitrary inputs AND arbitrary partitioning — the
distributed-correctness property the reference never had to state
(its per-event total order was implicit; ours is explicit (ts, event_id)).
"""

import datetime as dt
from itertools import groupby

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from deva_spark.operators import dedup, windows

BASE = dt.datetime(2024, 1, 1)

events = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),  # user_id
        st.integers(min_value=0, max_value=5),  # value (small domain => dups)
    ),
    min_size=0,
    max_size=40,
)

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def to_df(spark, pairs, n_partitions):
    rows = [
        (i, BASE + dt.timedelta(seconds=i), u, float(v))
        for i, (u, v) in enumerate(pairs)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    # arbitrary physical partitioning must never change results
    return df.repartition(n_partitions)


@given(pairs=events, parts=st.integers(min_value=1, max_value=5))
@SLOW
def test_running_fold_matches_python(spark, pairs, parts):
    df = to_df(spark, pairs, parts)
    out = {
        r.event_id: r.rs
        for r in df.transform(
            windows.running_fold(F.sum("value"), out="rs", partition="user_id")
        ).collect()
    }
    acc: dict[int, float] = {}
    for i, (u, v) in enumerate(pairs):
        acc[u] = acc.get(u, 0.0) + v
        assert out[i] == acc[u]


@given(pairs=events, parts=st.integers(min_value=1, max_value=5))
@SLOW
def test_consecutive_dedup_matches_python(spark, pairs, parts):
    df = to_df(spark, pairs, parts)
    got = sorted(
        r.event_id
        for r in df.transform(
            windows.consecutive_change_filter("value", "user_id")
        ).collect()
    )
    expected = []
    last: dict[int, float] = {}
    for i, (u, v) in enumerate(pairs):
        if u not in last or last[u] != float(v):
            expected.append(i)
        last[u] = float(v)
    assert got == expected


@given(pairs=events, parts=st.integers(min_value=1, max_value=5))
@SLOW
def test_first_seen_matches_python(spark, pairs, parts):
    df = to_df(spark, pairs, parts)
    got = sorted(
        r.event_id
        for r in df.transform(
            dedup.first_seen(["user_id", "value"], ["ts", "event_id"])
        ).collect()
    )
    seen = set()
    expected = []
    for i, (u, v) in enumerate(pairs):
        if (u, v) not in seen:
            seen.add((u, v))
            expected.append(i)
    assert got == expected


@given(
    pairs=events,
    n=st.integers(min_value=1, max_value=4),
    parts=st.integers(min_value=1, max_value=5),
)
@SLOW
def test_sliding_window_matches_python(spark, pairs, n, parts):
    df = to_df(spark, pairs, parts)
    out = {
        r.event_id: r.w
        for r in df.transform(
            windows.sliding_count_window(
                F.collect_list("value"), out="w", n=n, partition="user_id"
            )
        ).collect()
    }
    hist: dict[int, list[float]] = {}
    for i, (u, v) in enumerate(pairs):
        hist.setdefault(u, []).append(float(v))
        assert out[i] == hist[u][-n:]


@given(pairs=events, parts=st.integers(min_value=1, max_value=5))
@SLOW
def test_sessionize_matches_python(spark, pairs, parts):
    # 1-second spacing with a 30-min gap never splits: every user has
    # exactly one session regardless of partitioning
    if not pairs:
        return
    df = to_df(spark, pairs, parts)
    out = df.transform(windows.sessionize(30)).collect()
    per_user = sorted({(r.user_id, r.sess) for r in out})
    users = sorted({u for u, _ in pairs})
    assert per_user == [(u, 1) for u in users]


@given(
    pairs=events,
    n=st.integers(min_value=1, max_value=4),
    parts=st.integers(min_value=1, max_value=5),
)
@SLOW
def test_chunk_matches_python(spark, pairs, n, parts):
    df = to_df(spark, pairs, parts)
    out = df.transform(windows.chunk(n, drop_tail=True))
    got = sorted(
        (r.g, r.event_id) for r in out.select("g", "event_id").collect()
    )
    full_chunks = len(pairs) // n
    expected = sorted((i // n, i) for i in range(full_chunks * n))
    assert got == expected


@given(
    pairs=events,
    start=st.integers(min_value=1, max_value=10),
    parts=st.integers(min_value=1, max_value=5),
)
@SLOW
def test_slice_matches_python(spark, pairs, start, parts):
    end, step = start + 8, 3
    df = to_df(spark, pairs, parts)
    out = df.transform(
        windows.positional_slice(start, end, step, order=["event_id"])
    )
    got = sorted(r.event_id for r in out.collect())
    expected = [
        i for i in range(len(pairs))
        if start <= i + 1 < end and (i + 1 - start) % step == 0
    ]
    assert got == expected
