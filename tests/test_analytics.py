"""Funnel and retention operators — constructed event sequences."""

import datetime as dt

from deva_spark.operators.analytics import funnel_counts, retention_cohorts


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, dt.datetime(2024, 1, d, h), u, t) for i, (u, d, h, t) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string",
    )


def test_funnel_requires_order(spark):
    rows = [
        # user 1: full ordered funnel
        (1, 1, 1, "signup"), (1, 1, 2, "view"), (1, 1, 3, "click"),
        # user 2: click BEFORE view — converts to view only
        (2, 2, 1, "signup"), (2, 2, 2, "click"), (2, 2, 3, "view"),
        # user 3: never signed up — not in the funnel at all
        (3, 3, 1, "view"), (3, 3, 2, "click"),
    ]
    out = {
        r.step: (r.event_type, r.users, r.pct_of_first)
        for r in funnel_counts(_ev(spark, rows), ["signup", "view", "click"]).collect()
    }
    assert out == {
        1: ("signup", 2, 100),
        2: ("view", 2, 100),
        3: ("click", 1, 50),
    }


def test_funnel_strictly_after(spark):
    # the same timestamp does NOT convert (strict >)
    rows = [(1, 1, 5, "signup"), (1, 1, 5, "view")]
    out = {r.step: r.users for r in funnel_counts(_ev(spark, rows), ["signup", "view"]).collect()}
    assert out == {1: 1, 2: 0}


def test_funnel_zero_user_step_keeps_row(spark):
    # a step nobody reaches still yields its row (users=0), as do all
    # later steps — the oracle's scalar-subquery counts do the same
    rows = [(1, 1, 1, "signup"), (2, 2, 1, "signup")]
    out = {
        r.step: (r.users, r.pct_of_first)
        for r in funnel_counts(
            _ev(spark, rows), ["signup", "view", "click"]
        ).collect()
    }
    assert out == {1: (2, 100), 2: (0, 0), 3: (0, 0)}


def test_funnel_six_steps_matches_chained_min_reference(spark):
    # single-pass fold == chained min-aggregates (the r6 formulation) on
    # a 6-step funnel over a deterministic pseudo-random event soup
    steps = ["s1", "s2", "s3", "s4", "s5", "s6"]
    rows = []
    state = 41
    for _ in range(400):
        state = (state * 1103515245 + 12345) % (1 << 31)
        u = state % 23
        d = 1 + (state >> 8) % 27
        h = (state >> 16) % 24
        t = steps[(state >> 4) % len(steps)]
        rows.append((u, d, h, t))
    ev = _ev(spark, rows)
    pdf = ev.toPandas()

    # chained-min reference in pandas
    cur = None
    expected = {}
    for k, s in enumerate(steps, start=1):
        sub = pdf[pdf.event_type == s]
        if cur is None:
            cur = sub.groupby("user_id").ts.min()
        else:
            m = sub.merge(
                cur.rename("prev").reset_index(), on="user_id", how="inner"
            )
            m = m[m.ts > m.prev]
            cur = m.groupby("user_id").ts.min()
        expected[k] = len(cur)
    got = {r.step: r.users for r in funnel_counts(ev, steps).collect()}
    assert got == expected


def test_funnel_repeated_step_type(spark):
    # a funnel whose step list REPEATS a type (view -> click -> view)
    # must advance past the second occurrence (ADVICE r7: pre-mapping
    # events to their first matching step position capped this at 2)
    rows = [
        # user 1: view, click, view — full repeated-type funnel
        (1, 1, 1, "view"), (1, 1, 2, "click"), (1, 1, 3, "view"),
        # user 2: view, click, no second view — stops at 2
        (2, 2, 1, "view"), (2, 2, 2, "click"),
        # user 3: view, view, click — second view can't convert (needs
        # click first), click converts, then no third view
        (3, 3, 1, "view"), (3, 3, 2, "view"), (3, 3, 3, "click"),
    ]
    out = {
        r.step: (r.event_type, r.users)
        for r in funnel_counts(
            _ev(spark, rows), ["view", "click", "view"]
        ).collect()
    }
    assert out == {
        1: ("view", 3),
        2: ("click", 3),
        3: ("view", 1),
    }


def test_funnel_returns_lazy_plan(spark):
    # VERDICT r7: the result must be a lazy plan, not a pre-collected
    # local relation — building the DataFrame should launch no job
    rows = [(1, 1, 1, "signup"), (1, 1, 2, "view")]
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup() or [])
    df = funnel_counts(_ev(spark, rows), ["signup", "view"])
    after = len(tracker.getJobIdsForGroup() or [])
    assert after == before, "funnel_counts ran a job at plan-build time"
    # and the plan still evaluates correctly
    assert {r.step: r.users for r in df.collect()} == {1: 1, 2: 1}


def test_retention_cohorts_matrix(spark):
    rows = [
        # user 1: first seen day 1, active days 1, 2, 4
        (1, 1, 1, "view"), (1, 1, 2, "view"), (1, 2, 1, "view"), (1, 4, 1, "view"),
        # user 2: first seen day 2, active days 2, 4
        (2, 2, 1, "view"), (2, 4, 1, "view"),
    ]
    out = {
        (str(r.cohort_date), r.day_offset): r.users
        for r in retention_cohorts(_ev(spark, rows)).collect()
    }
    assert out == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 3): 1,
        ("2024-01-02", 0): 1,
        ("2024-01-02", 2): 1,
    }
    # max_offset trims the tail
    trimmed = retention_cohorts(_ev(spark, rows), max_offset=1).collect()
    assert all(r.day_offset <= 1 for r in trimmed)
