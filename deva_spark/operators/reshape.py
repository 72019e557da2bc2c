"""Reshaping pipes: transpose/zip, deep flatten, permutations.

Reference surface: ``transpose``/``izip`` (`/root/reference/deva/pipe.py:
1177-1191`), ``traverse`` deep-flatten (`pipe.py:698-738`),
``permutations`` (`pipe.py:605-618`), ``append``/``to_type`` column sugar
(`pipe.py:1101-1134`).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType


def zip_arrays(*cols: str, out: str = "zipped") -> Callable[[DataFrame], DataFrame]:
    """``izip``/``transpose`` analog: element-wise zip of array columns
    into an array of structs (``arrays_zip`` — row-local, no shuffle)."""

    def _t(df: DataFrame) -> DataFrame:
        return df.withColumn(out, F.arrays_zip(*cols))

    return _t


def deep_flatten(col: str, out: str = "flat") -> Callable[[DataFrame], DataFrame]:
    """``traverse`` analog for nested arrays: flatten every nesting level
    of an array<array<...>> column down to a flat array."""

    def _t(df: DataFrame) -> DataFrame:
        c = F.col(col)
        dtype = df.schema[col].dataType
        while isinstance(dtype, ArrayType) and isinstance(dtype.elementType, ArrayType):
            c = F.flatten(c)
            dtype = dtype.elementType
        return df.withColumn(out, c)

    return _t


def ordered_pairs(df: DataFrame, key: str) -> DataFrame:
    """``permutations(2)`` analog: all ordered pairs of distinct keys —
    expressed as a self cross-join minus the diagonal. At scale, prefer
    the banded/bucketed joins in functions.minhash over raw pairs."""
    a = df.select(F.col(key).alias("a")).distinct()
    b = df.select(F.col(key).alias("b")).distinct()
    return a.crossJoin(b).filter(F.col("a") != F.col("b"))


def append_element(col: str, value, out: str | None = None) -> Callable[[DataFrame], DataFrame]:
    """pipe ``append`` analog (`pipe.py:1101-1126`)."""

    def _t(df: DataFrame) -> DataFrame:
        return df.withColumn(out or col, F.array_append(F.col(col), F.lit(value)))

    return _t


def cast_to(col: str, dtype: str, out: str | None = None) -> Callable[[DataFrame], DataFrame]:
    """``to_type``/``to_int``/``to_str`` family analog (`pipe.py:1524-1557`)."""

    def _t(df: DataFrame) -> DataFrame:
        return df.withColumn(out or col, F.col(col).cast(dtype))

    return _t
