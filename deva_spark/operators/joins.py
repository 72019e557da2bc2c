"""Joins and stream-alignment combinators.

The reference has no relational join in its engine — joins appear as stream
combinators (``zip`` `/root/reference/deva/core/compute/ops.py:178-288`,
``combine_latest`` `ops.py:290-354`, ``zip_latest`` `ops.py:617-679`) and as
pandas merges in the app layer (`deva/naja/strategy/entry.py:682-698`).
Here they all become DataFrame joins / window functions.

Scale notes: dimension enrichment broadcasts the small side (no shuffle of
the fact table); fact-fact joins are shuffle hash / sort-merge on the join
key with AQE skew splitting. ``zip`` (positional) and as-of alignment key
on explicit ``(ts, event_id)`` because a distributed engine has no ambient
arrival order (SURVEY.md §7.3).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def enrich(
    dim: DataFrame,
    on: str | list[str] | Column,
    how: str = "left",
    broadcast_dim: bool = True,
) -> Callable[[DataFrame], DataFrame]:
    """Dimension-enrich join (naja merge analog, `entry.py:682-698`).

    ``broadcast_dim=True`` ships the dim table to every executor — the fact
    side never shuffles. Only disable for dims too big to broadcast.
    """

    def _t(df: DataFrame) -> DataFrame:
        right = F.broadcast(dim) if broadcast_dim else dim
        return df.join(right, on=on, how=how)

    return _t


def semi_join(other: DataFrame, on: str | list[str] | Column) -> Callable[[DataFrame], DataFrame]:
    """EXISTS — left semi join: probe side emits each row at most once and
    the build side carries only the key columns."""

    def _t(df: DataFrame) -> DataFrame:
        return df.join(other, on=on, how="left_semi")

    return _t


def anti_join(other: DataFrame, on: str | list[str] | Column) -> Callable[[DataFrame], DataFrame]:
    """NOT EXISTS — left anti join."""

    def _t(df: DataFrame) -> DataFrame:
        return df.join(other, on=on, how="left_anti")

    return _t


def positional_zip(
    left: DataFrame,
    right: DataFrame,
    order: Sequence[str],
    left_cols: dict[str, str],
    right_cols: dict[str, str],
) -> DataFrame:
    """``zip`` analog (`ops.py:178-288`): pair the i-th element of each input.

    Each side gets a global sequence number via the two-phase
    :func:`~deva_spark.operators.windows.global_positions` (quantile
    range-buckets + partition-local row_number + broadcast offsets — no
    single-reducer window), then an inner join on the sequence id
    (unmatched tails drop, matching the reference's bounded-buffer
    behavior).
    """
    from deva_spark.operators.windows import global_positions

    l = global_positions(left, order, out="rn").select(
        *[F.col(c).alias(a) for c, a in left_cols.items()], "rn"
    )
    r = global_positions(right, order, out="rn").select(
        *[F.col(c).alias(a) for c, a in right_cols.items()], "rn"
    )
    return l.join(r, "rn", "inner")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    suffix: str = "_asof",
    tolerance: str | None = None,
) -> DataFrame:
    """True as-of JOIN between two tables: each left row gets the most
    recent right row (per key) with ``right_ts <= left_ts``.

    Union-then-window formulation: tag both sides, sort by (key, ts, side)
    and carry the last right values forward — ONE shuffle on the key, no
    range self-join blowup (the naive `left.join(right, ts<=) + max` is
    quadratic per key). This is the scalable as-of shape; the reference's
    ``combine_latest`` (`ops.py:290-354`) is the single-stream special
    case.

    ``tolerance``: an INTERVAL string (e.g. ``"1 hour"``) — a match
    older than ``left_ts - tolerance`` is nulled out (the pandas
    ``merge_asof(tolerance=...)`` semantics). Implemented by carrying
    the matched right timestamp alongside the values and masking in the
    output projection: same single shuffle, no extra pass.
    """
    lt = left.withColumn("_side", F.lit(1)).withColumn("_ats", F.col(left_ts))
    rt = right.withColumn("_side", F.lit(0)).withColumn("_ats", F.col(right_ts))
    # the matched right row's own timestamp rides with the values so a
    # tolerance can mask stale matches after the carry
    carry_cols = list(value_cols) + ["__rts"]
    rts_type = right.schema[right_ts].dataType
    # shared union schema: left columns + right value columns, each side
    # nulling the other's slots
    lt2 = lt.select(
        "*",
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}")
            for c in value_cols
        ],
        F.lit(None).cast(rts_type).alias("_rv___rts"),
    )
    rt2 = rt.select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            if c not in rt.columns
            else F.col(c)
            for c in left.columns
        ],
        F.col("_side"),
        F.col("_ats"),
        *[F.col(c).alias(f"_rv_{c}") for c in value_cols],
        F.col(right_ts).alias("_rv___rts"),
    )
    u = lt2.select(
        *left.columns, "_side", "_ats", *[f"_rv_{c}" for c in carry_cols]
    ).unionByName(rt2)
    # right rows sort BEFORE left rows at equal timestamps (side 0 < 1), so
    # an exactly-simultaneous right row is visible to the left row
    w = (
        Window.partitionBy(key)
        .orderBy("_ats", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "*",
        *[
            F.last(f"_rv_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
        F.last("_rv___rts", ignorenulls=True).over(w).alias("__rts_m"),
    )
    out_vals: list = []
    for c in value_cols:
        col = F.col(f"{c}{suffix}")
        if tolerance is not None:
            col = F.when(
                F.col("__rts_m") >= F.col("_ats") - F.expr(f"INTERVAL {tolerance}"),
                col,
            ).alias(f"{c}{suffix}")
        out_vals.append(col)
    base_cols = [c for c in left.columns]
    return (
        carried.filter(F.col("_side") == 1)
        .select(*base_cols, *out_vals)
    )


def range_band_join(
    facts: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Range (theta) join: assign each fact row the band whose
    [lo, hi) interval contains its value. The band table is broadcast
    (bands are inherently small); the join is a broadcast nested-loop with
    a range predicate — no shuffle of the fact side."""

    return facts.join(
        F.broadcast(bands),
        (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col)),
        "left",
    )


def asof_latest(
    value_when: Column,
    partition: str,
    order: Sequence[str],
    out: str,
) -> Callable[[DataFrame], DataFrame]:
    """``combine_latest``/``zip_latest`` analog (`ops.py:290-354`, `617-679`).

    As-of alignment: for every row, the most recent non-null value of
    ``value_when`` (an expression that is NULL on non-trigger rows) within
    the partition, in event-time order. One window shuffle on the partition
    key; no join.
    """

    def _t(df: DataFrame) -> DataFrame:
        w = (
            Window.partitionBy(partition)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return df.withColumn(out, F.last(value_when, ignorenulls=True).over(w))

    return _t
