"""Windows, running folds, ordering analytics, sessionization.

Reference surface: ``sliding_window`` (`/root/reference/deva/core/compute/ops.py:924-973`),
``partition`` (`ops.py:874-922`), ``timed_window`` (`ops.py:975-1026`),
``accumulate``/``scan`` (`ops.py:738-824`), ``slice`` (`ops.py:826-872`),
``collect``-flush sessions (`ops.py:568-615`), naja Welford z-score
(`deva/naja/radar/engine.py:264-298`).

The reference's per-event arrival order does not exist in a distributed
engine, so every order-sensitive operator keys on an explicit
``(ts, event_id)`` total order (SURVEY.md §7.3). All window functions here
partition by a key (user_id, …): one shuffle on the key, then per-partition
sorted evaluation — the scalable shape. Un-partitioned global windows
(positional slice/partition-chunks) are single-reducer by nature; they are
provided for parity and flagged for bounded inputs only.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

#: Deterministic event total order used across the events table.
EVENT_ORDER: tuple[str, str] = ("ts", "event_id")


def keyed_order(partition: str | None, order: Sequence[str] = EVENT_ORDER) -> WindowSpec:
    w = Window.partitionBy(partition) if partition else Window.partitionBy()
    return w.orderBy(*order)


def running_fold(
    expr: Column, out: str, partition: str | None, order: Sequence[str] = EVENT_ORDER
) -> Callable[[DataFrame], DataFrame]:
    """``accumulate``/``scan`` analog (`ops.py:738-824`): running aggregate
    over all preceding rows in event order."""

    def _t(df: DataFrame) -> DataFrame:
        w = keyed_order(partition, order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        return df.withColumn(out, expr.over(w))

    return _t


def sliding_count_window(
    expr: Column, out: str, n: int, partition: str | None, order: Sequence[str] = EVENT_ORDER
) -> Callable[[DataFrame], DataFrame]:
    """``sliding_window(n)`` analog (`ops.py:924-973`): aggregate over the
    last-n rows (current included), emitted per row. ``return_partial=True``
    semantics: partial windows during warmup are included."""

    def _t(df: DataFrame) -> DataFrame:
        w = keyed_order(partition, order).rowsBetween(-(n - 1), Window.currentRow)
        return df.withColumn(out, expr.over(w))

    return _t


def chunk(
    n: int, order: Sequence[str] = EVENT_ORDER, drop_tail: bool = True
) -> Callable[[DataFrame], DataFrame]:
    """``partition(n)`` analog (`ops.py:874-922`): non-overlapping n-row
    chunks in global order, tail dropped to match the reference.

    Global row_number = single-reducer ordering; parity operator for
    bounded inputs (at scale, chunk within a partition key instead).
    """

    def _t(df: DataFrame) -> DataFrame:
        rn = F.row_number().over(Window.orderBy(*order))
        out = df.withColumn("g", F.floor((rn - F.lit(1)) / F.lit(n)).cast("bigint"))
        if drop_tail:
            counts = out.groupBy("g").agg(F.count(F.lit(1)).alias("_cnt"))
            out = (
                out.join(F.broadcast(counts.filter(F.col("_cnt") == n)), "g")
                .drop("_cnt")
            )
        return out

    return _t


def positional_slice(
    start: int, end: int, step: int, order: Sequence[str] = EVENT_ORDER
) -> Callable[[DataFrame], DataFrame]:
    """``slice(start, end, step)`` analog (`ops.py:826-872`): positional
    selection over the event sequence (1-based row_number, [start, end))."""

    def _t(df: DataFrame) -> DataFrame:
        rn = F.row_number().over(Window.orderBy(*order))
        out = df.withColumn("_rn", rn).filter(
            (F.col("_rn") >= start)
            & (F.col("_rn") < end)
            & (((F.col("_rn") - start) % step) == 0)
        )
        return out.drop("_rn")

    return _t


def rank_top_per_key(
    k: int, partition: str, order: Sequence[Column]
) -> Callable[[DataFrame], DataFrame]:
    """Ranking window: top-k rows per key (RANK, ties kept)."""

    def _t(df: DataFrame) -> DataFrame:
        w = Window.partitionBy(partition).orderBy(*order)
        return df.withColumn("_r", F.rank().over(w)).filter(F.col("_r") <= k).drop("_r")

    return _t


def lag_diff(
    value: str, out: str, partition: str, order: Sequence[str] = EVENT_ORDER
) -> Callable[[DataFrame], DataFrame]:
    """Lag/lead analytic (``uniq``-adjacent): difference vs previous row."""

    def _t(df: DataFrame) -> DataFrame:
        w = keyed_order(partition, order)
        return df.withColumn(out, F.col(value) - F.lag(value).over(w))

    return _t


def tumbling_time_window(
    ts_col: str, duration: str, keys: Sequence[str], aggs: dict[str, Column]
) -> Callable[[DataFrame], DataFrame]:
    """``timed_window(interval)`` analog (`ops.py:975-1026`) upgraded from
    processing time to event time: groupBy(window(ts, w)). In streaming mode
    the identical expression runs with a watermark (streaming/twin.py)."""

    def _t(df: DataFrame) -> DataFrame:
        return (
            df.groupBy(F.window(F.col(ts_col), duration).alias("w"), *keys)
            .agg(*[c.alias(n) for n, c in aggs.items()])
            .withColumn("w", F.col("w.start"))
        )

    return _t


def rolling_time_agg(
    expr: Column,
    out: str,
    seconds: int,
    partition: str,
    ts_col: str = "ts",
    tiebreak: str = "event_id",
) -> Callable[[DataFrame], DataFrame]:
    """Time-range rolling window: aggregate over the trailing ``seconds``
    of event time per key (`[t - s, t]`, inclusive both ends — SQL RANGE
    frame semantics).

    The frame orders by epoch MICROSECONDS as a bigint — an exact integer
    frame both engines implement identically (ordering by raw timestamps
    would hit each engine's own interval frame arithmetic). One shuffle on
    the partition key.
    """

    def _t(df: DataFrame) -> DataFrame:
        d2 = df.withColumn("_us", F.unix_micros(F.col(ts_col)))
        w = (
            Window.partitionBy(partition)
            .orderBy("_us")
            .rangeBetween(-seconds * 1_000_000, 0)
        )
        return d2.withColumn(out, expr.over(w)).drop("_us")

    return _t


def sessionize(
    gap_minutes: int, partition: str = "user_id", order: Sequence[str] = EVENT_ORDER, ts_col: str = "ts"
) -> Callable[[DataFrame], DataFrame]:
    """Session windows with an inactivity gap (the reference's closest analog
    is signal-driven ``collect``+flush, `ops.py:568-615`).

    Batch formulation: mark rows whose gap from the previous event exceeds
    the threshold, then a running sum assigns session ids — two window
    passes over one shuffle of the partition key. (Streaming twin uses
    ``session_window``.)
    """

    def _t(df: DataFrame) -> DataFrame:
        w = keyed_order(partition, order)
        # Exact integer gap test (epoch microseconds) — double-epoch seconds
        # carry ~0.4 µs rounding at 1e9 magnitude, enough to flip a row that
        # lands exactly on the gap boundary vs the oracle's INTERVAL compare.
        us = F.unix_micros(F.col(ts_col))
        prev_us = F.lag(us).over(w)
        new_s = F.when(
            prev_us.isNull() | (us - prev_us > gap_minutes * 60 * 1_000_000),
            F.lit(1),
        ).otherwise(F.lit(0))
        df2 = df.withColumn("_new_s", new_s)
        w2 = keyed_order(partition, order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        return df2.withColumn("sess", F.sum("_new_s").over(w2)).drop("_new_s")

    return _t


def consecutive_change_filter(
    value: str, partition: str, order: Sequence[str] = EVENT_ORDER
) -> Callable[[DataFrame], DataFrame]:
    """``uniq`` analog (`pipe.py:377-423`): keep rows where the value differs
    from the previous row's value (collapse consecutive duplicates)."""

    def _t(df: DataFrame) -> DataFrame:
        w = keyed_order(partition, order)
        prev = F.lag(value).over(w)
        return df.withColumn("_p", prev).filter(
            F.col("_p").isNull() | (F.col("_p") != F.col(value))
        ).drop("_p")

    return _t
