"""Routing, pub/sub dispatch, and error-capturing stages.

Reference surface: ``route`` predicate-dispatch decorator
(`/root/reference/deva/core/core.py:1064-1102`), ``sub``/``pub`` topic
pub-sub (`core.py:1141-1161`), ``catch``/``@`` fn-capture (`core.py:879-937`)
and ``catch_except``/``^`` exception-capture (`core.py:939-1003`).

Spark mapping: routing is N filtered children of one plan (the scan is
shared; each route's predicate pushes down), pub/sub is a topic column +
filtered subscribers, and exception capture is the error-side-output
pattern: a UDF stage returns a (result, error) struct and the flow splits
— rows never kill the job, bad records land in a side table
(badRecordsPath analog).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType, StructField, StructType


def route(df: DataFrame, routes: dict[str, Column]) -> dict[str, DataFrame]:
    """``@s.route(pred)`` analog: one filtered child per named predicate.

    Each child is an independent plan over the same source — Catalyst
    pushes each predicate into its own scan, and at 100 TB each route is
    its own query with full pruning (not a driver-side row dispatch).
    """
    return {name: df.filter(cond) for name, cond in routes.items()}


def case_route(df: DataFrame, routes: dict[str, Column], out: str = "route", default: str = "other") -> DataFrame:
    """Single-pass variant: tag rows with the first matching route name
    (CASE WHEN dispatch) — when downstream wants one partitioned write
    (``partitionBy(route)``) instead of N scans."""
    expr = F.lit(default)
    for name, cond in reversed(list(routes.items())):
        expr = F.when(cond, F.lit(name)).otherwise(expr)
    return df.withColumn(out, expr)


def publish(df: DataFrame, topic: str, topic_col: str = "topic") -> DataFrame:
    """``pub`` analog: stamp rows with a topic."""
    return df.withColumn(topic_col, F.lit(topic))


def subscribe(df: DataFrame, topic: str, topic_col: str = "topic") -> DataFrame:
    """``sub`` analog: a subscriber is a topic-filtered child; with a
    partitioned/bucketed topic column the filter is partition pruning."""
    return df.filter(F.col(topic_col) == topic)


def try_stage(
    fn: Callable[[Any], Any],
    in_col: str,
    out_col: str = "result",
    err_col: str = "error",
    out_type: str = "string",
) -> Callable[[DataFrame], DataFrame]:
    """``catch_except`` analog: run a Python fn per row, capturing
    exceptions into an error column instead of failing the job.

    The reference emits ``{function, param, except}`` events into the
    stream (`core.py:939-1003`); here failures become rows in a side
    output, split off with :func:`split_errors`.

    ``out_type``: the DDL type of the result column. Results cross the
    Arrow boundary as strings (the one representation a failed row's
    NULL shares with any success type) and are CAST to ``out_type``
    afterwards — previously the parameter was accepted but IGNORED and
    every result came back as a string (r11 review).
    """
    result_schema = StructType(
        [
            StructField("result", StringType()),
            StructField("error", StringType()),
        ]
    )

    @pandas_udf(result_schema)
    def run(vals: pd.Series) -> pd.DataFrame:
        results, errors = [], []
        for v in vals:
            try:
                r = fn(v)
                results.append(None if r is None else str(r))
                errors.append(None)
            except Exception as e:  # noqa: BLE001 — the operator's contract
                results.append(None)
                errors.append(f"{type(e).__name__}: {e}")
        return pd.DataFrame({"result": results, "error": errors})

    def _t(df: DataFrame) -> DataFrame:
        tagged = df.withColumn("_r", run(F.col(in_col)))
        return (
            tagged.withColumn(out_col, F.col("_r.result").cast(out_type))
            .withColumn(err_col, F.col("_r.error"))
            .drop("_r")
        )

    return _t


def split_errors(df: DataFrame, err_col: str = "error") -> tuple[DataFrame, DataFrame]:
    """(good_rows, error_rows) side-output split."""
    return df.filter(F.col(err_col).isNull()).drop(err_col), df.filter(
        F.col(err_col).isNotNull()
    )
