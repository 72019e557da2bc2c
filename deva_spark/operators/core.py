"""Relational core: scan / project / filter / union / set ops / sort / limit.

Reference surface: ``Stream.map`` (`/root/reference/deva/core/core.py:1326-1463`),
``Stream.filter`` (`core/core.py:1521-1554`), ``Stream.remove``
(`core/core.py:811-813`), ``pluck`` (`core/compute/ops.py:526-566`),
``flatten`` (`core/compute/ops.py:356-400`), ``union``
(`core/compute/ops.py:488-524`), pipe ``sort``/``head``/``as_set``
(`pipe.py:1018-1028`, `276-301`, `600-602`).

All of these are single built-in DataFrame ops — expressed declaratively so
Catalyst pushes filters/projections into the parquet scan and whole-stage
codegen fuses the narrow chains. No shuffle except sort/distinct/set-ops,
which shuffle on exactly their keys (unavoidable and AQE-coalesced).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ColumnLike = Column | str


def project(*cols: ColumnLike) -> Callable[[DataFrame], DataFrame]:
    """``map``/``pluck`` analog: narrow projection, pruned at the scan."""

    def _t(df: DataFrame) -> DataFrame:
        return df.select(*cols)

    return _t


def where(cond: Column) -> Callable[[DataFrame], DataFrame]:
    """``filter`` analog; predicate is pushed down to the source scan."""

    def _t(df: DataFrame) -> DataFrame:
        return df.filter(cond)

    return _t


def remove(cond: Column) -> Callable[[DataFrame], DataFrame]:
    """Inverted filter (`core/core.py:811-813`)."""

    def _t(df: DataFrame) -> DataFrame:
        return df.filter(~cond)

    return _t


def with_columns(**exprs: Column) -> Callable[[DataFrame], DataFrame]:
    """``map`` that adds derived columns (withColumns batches into one
    projection node — single codegen stage)."""

    def _t(df: DataFrame) -> DataFrame:
        return df.withColumns(dict(exprs))

    return _t


def explode_col(col: ColumnLike, alias: str) -> Callable[[DataFrame], DataFrame]:
    """``flatten``/``concat`` analog (`core/compute/ops.py:356-400`):
    explode an array column into one row per element — a narrow (generate)
    op, no shuffle."""

    def _t(df: DataFrame) -> DataFrame:
        return df.withColumn(alias, F.explode(col))

    return _t


def union_all(*others: DataFrame) -> Callable[[DataFrame], DataFrame]:
    """``union``/``chain_with`` analog: bag union by column name, no shuffle."""

    def _t(df: DataFrame) -> DataFrame:
        out = df
        for o in others:
            out = out.unionByName(o)
        return out

    return _t


def distinct_rows(df: DataFrame) -> DataFrame:
    """``as_set`` analog: hash-aggregate distinct (map-side partial combine
    first, so the shuffle carries only unique keys per partition)."""
    return df.distinct()


def order_by(*cols: ColumnLike) -> Callable[[DataFrame], DataFrame]:
    """``sort`` analog: range-partitioned total sort."""

    def _t(df: DataFrame) -> DataFrame:
        return df.orderBy(*cols)

    return _t


def top_k(k: int, *order_cols: ColumnLike) -> Callable[[DataFrame], DataFrame]:
    """``sort | head(k)`` / composed top-k (`pipe.py:1614-1615`).

    Spark plans orderBy+limit as TakeOrderedAndProject: per-partition heap
    of k rows, then a k-row merge on the driver — no full sort, no full
    shuffle. This is the 100 TB-safe top-k.
    """

    def _t(df: DataFrame) -> DataFrame:
        return df.orderBy(*order_cols).limit(k)

    return _t


def intersect_keys(other: DataFrame) -> Callable[[DataFrame], DataFrame]:
    """Set intersect (gap in the reference — only Python sets, `pipe.py:600`)."""

    def _t(df: DataFrame) -> DataFrame:
        return df.intersect(other)

    return _t


def except_distinct(other: DataFrame) -> Callable[[DataFrame], DataFrame]:
    """SQL EXCEPT (distinct semantics)."""

    def _t(df: DataFrame) -> DataFrame:
        return df.distinct().subtract(other)

    return _t


def pluck(fields: Sequence[str] | str) -> Callable[[DataFrame], DataFrame]:
    """``pluck`` analog (`core/compute/ops.py:526-566`): field extraction."""
    if isinstance(fields, str):
        fields = [fields]

    def _t(df: DataFrame) -> DataFrame:
        return df.select(*fields)

    return _t
