"""Window/stateful micro-fixtures from the reference doctests:
sliding_window triples (`ops.py:941-952`), partition(3) (`ops.py:890-896`),
accumulate running sums (`ops.py:764-773`), unique(maxsize=1) consecutive
dedup (`ops.py:427-434`), slice (`ops.py:826-872`), sessionization.
"""

import datetime as dt

from pyspark.sql import functions as F

from deva_spark.operators import dedup, windows


def seq_df(spark, values):
    """Sequence with explicit (ts, event_id) total order and one user."""
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=i), 1, v) for i, v in enumerate(values)
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )


def test_running_fold_accumulate(spark):
    # accumulate(add) over 0..4 -> 0,1,3,6,10
    df = seq_df(spark, [0.0, 1.0, 2.0, 3.0, 4.0])
    out = df.transform(
        windows.running_fold(F.sum("value"), out="rs", partition="user_id")
    )
    assert [r.rs for r in out.orderBy("event_id").collect()] == [0, 1, 3, 6, 10]


def test_sliding_count_window(spark):
    # sliding_window(3) with partial warmup over 0..4
    df = seq_df(spark, [0.0, 1.0, 2.0, 3.0, 4.0])
    out = df.transform(
        windows.sliding_count_window(
            F.collect_list("value"), out="w", n=3, partition="user_id"
        )
    )
    got = [r.w for r in out.orderBy("event_id").collect()]
    assert got == [[0.0], [0.0, 1.0], [0.0, 1.0, 2.0], [1.0, 2.0, 3.0], [2.0, 3.0, 4.0]]


def test_partition_chunks_drop_tail(spark):
    # partition(3): 0..9 -> (0,1,2),(3,4,5),(6,7,8); tail 9 dropped
    df = seq_df(spark, [float(i) for i in range(10)])
    out = df.transform(windows.chunk(3, order=["ts", "event_id"], drop_tail=True))
    groups = (
        out.groupBy("g").agg(F.sort_array(F.collect_list("value")).alias("vs"))
        .orderBy("g")
        .collect()
    )
    assert [r.vs for r in groups] == [[0.0, 1.0, 2.0], [3.0, 4.0, 5.0], [6.0, 7.0, 8.0]]


def test_positional_slice(spark):
    # slice(2, 6, 2) over ids 0..9 -> 1-based rows 2,4 -> event_ids 1,3
    df = seq_df(spark, [float(i) for i in range(10)])
    out = df.transform(windows.positional_slice(2, 6, 2, order=["event_id"]))
    assert sorted(r.event_id for r in out.collect()) == [1, 3]


def test_consecutive_dedup_unique_maxsize1(spark):
    # unique(maxsize=1): 1,1,2,2,2,1,3 -> 1,2,1,3
    df = seq_df(spark, [1.0, 1.0, 2.0, 2.0, 2.0, 1.0, 3.0])
    out = df.transform(windows.consecutive_change_filter("value", "user_id"))
    assert [r.value for r in out.orderBy("event_id").collect()] == [1.0, 2.0, 1.0, 3.0]


def test_first_seen_dedup(spark):
    df = seq_df(spark, [5.0, 5.0, 7.0, 5.0, 7.0])
    out = df.transform(dedup.first_seen(["value"], ["ts", "event_id"]))
    assert sorted(r.event_id for r in out.collect()) == [0, 2]


def test_sessionize_gap(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (0, base, 1, 1.0),
        (1, base + dt.timedelta(minutes=10), 1, 1.0),
        (2, base + dt.timedelta(minutes=50), 1, 1.0),  # 40min gap -> new session
        (3, base + dt.timedelta(minutes=55), 1, 1.0),
        (4, base, 2, 1.0),  # other user: own session numbering
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    out = df.transform(windows.sessionize(30)).orderBy("event_id").collect()
    assert [(r.user_id, r.sess) for r in out] == [(1, 1), (1, 1), (1, 2), (1, 2), (2, 1)]


def test_exact_text_groups(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, " a b "), (3, "c"), (4, "a b")], "doc_id long, text string"
    )
    out = df.transform(dedup.exact_text_groups()).collect()
    assert [(r.keep, r.dups) for r in out] == [(1, 3)]


def test_incremental_exact_dups_matches_full_replay(spark):
    # incremental exact dedup (new digests vs staged digest table) must
    # equal the union corpus's exact_text_groups membership restricted
    # to new docs: batch-vs-old dup, batch-internal dup (min batch id
    # survives), whitespace-normalized match, and a unique doc
    old = spark.createDataFrame(
        [(1, "a b"), (2, "c d"), (3, "e f")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [
            (10, " a b "),  # dup of old 1 via trim
            (11, "x y"),    # batch-internal group with 12
            (12, "x y"),
            (13, "fresh"),  # unique
        ],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.dup_of)
        for r in dedup.incremental_exact_dups(new, dedup.digests(old)).collect()
    }
    assert got == {(10, 1), (12, 11)}
    # full-replay parity: every union-corpus dup group's non-keep NEW
    # members appear with the group's keeper, nothing else
    union = old.unionByName(new)
    groups = union.transform(dedup.exact_text_groups()).collect()
    keepers = {r.keep for r in groups}
    assert keepers == {1, 11}
    # appending the batch digests leaves the next batch's base complete
    appended = dedup.digests(old).unionByName(dedup.digests(new))
    again = dedup.incremental_exact_dups(
        spark.createDataFrame([(20, "x y")], "doc_id long, text string"),
        appended,
    ).collect()
    assert [(r.doc_id, r.dup_of) for r in again] == [(20, 11)]


def test_epoch_micros_session_tz_independent(spark):
    """ADVICE r4: NTZ epoch must not shift under a non-UTC session tz.

    The old ``to_utc_timestamp(ntz, 'UTC')`` form implicitly cast
    NTZ->LTZ through the SESSION timezone, so America/New_York produced
    18000000000us for the NTZ epoch instead of 0.
    """
    df = spark.createDataFrame(
        [(0, "1970-01-01 00:00:00"), (1, "2024-07-01 12:34:56.789")],
        "id long, s string",
    ).withColumn("ts", F.col("s").cast("timestamp_ntz"))
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        utc_vals = {
            r.id: r.us
            for r in df.select(
                "id", windows.epoch_micros(df, "ts").alias("us")
            ).collect()
        }
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        ny_vals = {
            r.id: r.us
            for r in df.select(
                "id", windows.epoch_micros(df, "ts").alias("us")
            ).collect()
        }
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert utc_vals[0] == 0
    assert utc_vals == ny_vals


def test_merge_intervals_islands(spark):
    # overlapping + touching spans merge; disjoint spans stay separate;
    # a span contained in an earlier long span must not restart the
    # island (running-max-end, not lag-end)
    from deva_spark.operators.windows import merge_intervals

    rows = [
        ("a", 0, 10), ("a", 5, 7), ("a", 10, 12),   # one island 0-12
        ("a", 20, 25),                                # second island
        ("a", 21, 22),                                # contained
        ("b", 0, 100), ("b", 50, 60), ("b", 90, 200),  # one island 0-200
    ]
    df = spark.createDataFrame(rows, "k string, start long, end long")
    out = sorted(
        (r.k, r.start, r.end, r.n_merged)
        for r in df.transform(
            merge_intervals("start", "end", partition="k")
        ).collect()
    )
    assert out == [
        ("a", 0, 12, 3),
        ("a", 20, 25, 2),
        ("b", 0, 200, 3),
    ]
    # partitioning invariance
    out2 = sorted(
        (r.k, r.start, r.end, r.n_merged)
        for r in df.repartition(5)
        .transform(merge_intervals("start", "end", partition="k"))
        .collect()
    )
    assert out2 == out


def test_null_group_keys_survive_two_phase_paths(spark):
    # r11 review: every broadcast group-total/offset join in the
    # two-phase family must use NULL-SAFE key equality — a NULL group
    # key is a real group (SQL window partitions and groupBy both keep
    # it), and a name-based equi-join silently drops those rows.
    from deva_spark.operators.sampling import top_p_by_group

    rows = [
        ("a", 1, 10), ("a", 2, 5), ("a", 3, 1),
        (None, 4, 8), (None, 5, 4), (None, 6, 2),
    ]
    df = spark.createDataFrame(rows, "g string, id long, w long")
    # force the scale path — the cutover would hide the joins entirely
    prev = spark.conf.get("spark.deva.positional.smallInputBytes", None)
    spark.conf.set("spark.deva.positional.smallInputBytes", "0")
    try:
        pos = windows.global_positions(
            df, order=("w", "id"), out="rn", group_cols=("g",)
        )
        got = {(r.g, r.id): r.rn for r in pos.collect()}
        assert len(got) == 6  # no NULL-keyed row vanished
        assert got[(None, 5)] == 2  # ordered by (w, id) within NULL group

        cum = windows.global_running_sum(
            df, "w", order=("w", "id"), out="cum", group_cols=("g",)
        )
        cgot = {(r.g, r.id): r.cum for r in cum.collect()}
        assert len(cgot) == 6
        assert cgot[(None, 4)] == 14  # 2 + 4 + 8 inclusive running sum

        kept = df.transform(
            top_p_by_group(["g"], "w", p_pct=60, order_tiebreak="id")
        ).collect()
        by_g = {}
        for r in kept:
            by_g.setdefault(r.g, []).append(r.w)
        # NULL group present with its own top-p cut: 8 covers 8/14 ~ 57%
        # < 60%, so the straddler 4 is kept too
        assert sorted(by_g[None]) == [4, 8]
        assert sorted(by_g["a"]) == [10]  # 10/16 = 62.5% >= 60%
    finally:
        if prev is None:
            spark.conf.unset("spark.deva.positional.smallInputBytes")
        else:
            spark.conf.set("spark.deva.positional.smallInputBytes", prev)
