"""Event-funnel and cohort-retention analytics.

Reference surface: the event-stream analytics the reference builds ad
hoc from `deva/core/stream.py` accumulators over event dicts (windowed
counts, `when(cond)` triggers) — re-expressed here as the two canonical
product-analytics shapes a 100 TB event table needs first: ordered
funnels and retention cohorts. Both are pure DataFrame compositions —
no UDFs, no windows wider than a per-user group.

Scale shapes:

- :func:`funnel_counts` is one filtered min-aggregate per step, chained
  by a per-user join — each stage shuffles (user, ts) pairs only, with
  map-side partial mins; step k's input is the step-type filter pushed
  to the scan, never the whole table re-staged.
- :func:`retention_cohorts` is two hash aggregates (per-user first day,
  then per (cohort, offset) distinct users) — the distinct is over
  (user, cohort, offset), bounded by active user-days.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel conversion: step k counts users whose first
    ``steps[k]`` event falls STRICTLY after their step k-1 entry time
    (the classic product funnel — out-of-order events don't convert).

    Returns one row per step: ``(step, event_type, users,
    pct_of_first)`` with an integer-floored percentage of the step-1
    cohort (``div`` — no float boundary, bit-stable across engines).
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    stage_counts: list[tuple[int, str, DataFrame]] = []
    cur: DataFrame | None = None
    for i, step in enumerate(steps):
        ev = events.filter(F.col(type_col) == step).select(
            F.col(user_col).alias("_u"), F.col(ts_col).alias("_ts")
        )
        if cur is None:
            cur = ev.groupBy("_u").agg(F.min("_ts").alias("_t"))
        else:
            cur = (
                ev.join(cur, "_u")
                .filter(F.col("_ts") > F.col("_t"))
                .groupBy("_u")
                .agg(F.min("_ts").alias("_t"))
            )
        stage_counts.append((i, step, cur.agg(F.count(F.lit(1)).alias("n"))))
    rows = None
    for i, step, cnt in stage_counts:
        r = cnt.select(
            F.lit(i + 1).alias("step"),
            F.lit(step).alias("event_type"),
            F.col("n").alias("users"),
        )
        rows = r if rows is None else rows.unionByName(r)
    first = stage_counts[0][2].select(F.col("n").alias("_n1"))
    return (
        rows.crossJoin(F.broadcast(first))
        .select(
            "step",
            "event_type",
            "users",
            F.expr("(users * 100) div _n1").alias("pct_of_first"),
        )
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset: int | None = None,
) -> DataFrame:
    """Cohort retention matrix: users grouped by their first-seen day,
    counted on each later day they were active.

    Returns ``(cohort_date, day_offset, users)`` — ``day_offset`` 0 is
    the cohort size itself. ``max_offset`` trims the matrix (e.g. 30 for
    a monthly view); None keeps every observed offset.
    """
    days = events.select(
        F.col(user_col).alias("_u"),
        F.to_date(F.col(ts_col)).alias("_d"),
    ).distinct()
    cohort = days.groupBy("_u").agg(F.min("_d").alias("cohort_date"))
    joined = days.join(cohort, "_u").select(
        "_u",
        "cohort_date",
        F.datediff(F.col("_d"), F.col("cohort_date")).alias("day_offset"),
    )
    if max_offset is not None:
        joined = joined.filter(F.col("day_offset") <= max_offset)
    return joined.groupBy("cohort_date", "day_offset").agg(
        F.count(F.lit(1)).alias("users")
    )
