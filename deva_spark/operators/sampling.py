"""Sampling and limits: head/tail/skip/sample.

Reference surface: pipe ``head``/``tail``/``skip``/``sample``
(`/root/reference/deva/pipe.py:276-333`, `1380-1425`).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def head(n: int) -> Callable[[DataFrame], DataFrame]:
    def _t(df: DataFrame) -> DataFrame:
        return df.limit(n)

    return _t


def tail_by(n: int, order: Sequence[str]) -> Callable[[DataFrame], DataFrame]:
    """tail = top-n of the reversed order (TakeOrderedAndProject — no full
    sort)."""

    def _t(df: DataFrame) -> DataFrame:
        return df.orderBy(*[F.col(c).desc() for c in order]).limit(n)

    return _t


def skip(k: int, order: Sequence[str]) -> Callable[[DataFrame], DataFrame]:
    """``skip(k)``: drop the first k rows of the total order (global
    row_number — bounded-input parity op)."""

    def _t(df: DataFrame) -> DataFrame:
        rn = F.row_number().over(Window.orderBy(*order))
        return df.withColumn("_rn", rn).filter(F.col("_rn") > k).drop("_rn")

    return _t


def take_while(cond, order: Sequence[str]) -> Callable[[DataFrame], DataFrame]:
    """pipe ``take_while`` analog (`pipe.py:984-989`): keep rows until the
    first one (in the total order) that fails the predicate.

    Running-flag formulation: a row survives iff every row up to and
    including it passes — ``min(cond) over (order rows unbounded preceding)``
    — one global-order window (bounded-input parity op, like slice).
    """

    def _t(df: DataFrame) -> DataFrame:
        w = (
            Window.orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        flag = F.min(cond.cast("int")).over(w)
        return df.withColumn("_tw", flag).filter(F.col("_tw") == 1).drop("_tw")

    return _t


def skip_while(cond, order: Sequence[str]) -> Callable[[DataFrame], DataFrame]:
    """pipe ``skip_while`` analog (`pipe.py:992-997`): drop the leading run
    of rows satisfying the predicate, keep everything after."""

    def _t(df: DataFrame) -> DataFrame:
        w = (
            Window.orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        flag = F.min(cond.cast("int")).over(w)
        return df.withColumn("_sw", flag).filter(F.col("_sw") == 0).drop("_sw")

    return _t


def bernoulli_sample(fraction: float, seed: int = 42) -> Callable[[DataFrame], DataFrame]:
    """``sample`` analog: per-row Bernoulli sample — fully distributed (the
    reference's reservoir sampling is single-process; at scale a fraction
    sample + exact limit is the idiom)."""

    def _t(df: DataFrame) -> DataFrame:
        return df.sample(fraction=fraction, seed=seed)

    return _t
