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


def bernoulli_sample(fraction: float, seed: int = 42) -> Callable[[DataFrame], DataFrame]:
    """``sample`` analog: per-row Bernoulli sample — fully distributed (the
    reference's reservoir sampling is single-process; at scale a fraction
    sample + exact limit is the idiom)."""

    def _t(df: DataFrame) -> DataFrame:
        return df.sample(fraction=fraction, seed=seed)

    return _t
