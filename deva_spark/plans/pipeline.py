"""Declarative pipeline-spec runner.

Reference surface: naja's StrategyEngine interprets a declarative list of
``{feature, model, logic}`` steps resolved through registries
(`/root/reference/deva/naja/strategy/declarative.py:84-196`) — the closest
thing to a query plan in the reference. Here a spec is a JSON-able list of
``{"op": name, ...params}`` steps resolved through an operator registry and
compiled into ONE DataFrame plan — so the whole pipeline optimizes as a
unit under Catalyst (filters in step 5 still push down past step 1).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Transform = Callable[[DataFrame], DataFrame]

#: operator factories: params -> DataFrame transform
_REGISTRY: dict[str, Callable[..., Transform]] = {}


def register_op(name: str) -> Callable[[Callable[..., Transform]], Callable[..., Transform]]:
    """Operator registration (``Stream.register_api`` analog,
    `core/core.py:573-608`)."""

    def deco(factory: Callable[..., Transform]) -> Callable[..., Transform]:
        _REGISTRY[name] = factory
        return factory

    return deco


def _expr(e: str) -> Column:
    return F.expr(e)


@register_op("filter")
def _filter(expr: str) -> Transform:
    return lambda df: df.filter(_expr(expr))


@register_op("select")
def _select(exprs: list[str]) -> Transform:
    return lambda df: df.selectExpr(*exprs)


@register_op("with_column")
def _with_column(name: str, expr: str) -> Transform:
    return lambda df: df.withColumn(name, _expr(expr))


@register_op("group_agg")
def _group_agg(keys: list[str], aggs: dict[str, str]) -> Transform:
    return lambda df: df.groupBy(*keys).agg(
        *[_expr(e).alias(n) for n, e in aggs.items()]
    )


@register_op("order_by")
def _order_by(exprs: list[str]) -> Transform:
    # "expr desc"/"expr asc" suffixes: F.expr would silently read the
    # direction word as an implicit alias, so strip it here.
    def parse(e: str) -> Column:
        low = e.rstrip().lower()
        if low.endswith(" desc"):
            return _expr(e.rstrip()[:-5]).desc()
        if low.endswith(" asc"):
            return _expr(e.rstrip()[:-4]).asc()
        return _expr(e)

    return lambda df: df.orderBy(*[parse(e) for e in exprs])


@register_op("limit")
def _limit(n: int) -> Transform:
    return lambda df: df.limit(n)


@register_op("join")
def _join(table: str, on: str, how: str = "left", broadcast: bool = False) -> Transform:
    def _t(df: DataFrame) -> Transform:
        other = df.sparkSession.table(table)
        if broadcast:
            other = F.broadcast(other)
        return df.join(other, on=F.expr(on), how=how)

    return _t


@register_op("dedup_first_seen")
def _dedup(keys: list[str], order: list[str]) -> Transform:
    from deva_spark.operators.dedup import first_seen

    return first_seen(keys, order)


@register_op("explode")
def _explode(col: str, alias: str) -> Transform:
    return lambda df: df.withColumn(alias, F.explode(_expr(col)))


@register_op("window_agg")
def _window_agg(expr: str, out: str, partition: list[str], order: list[str]) -> Transform:
    """Running/analytic window step: expr evaluated over
    (partition, order, unbounded-preceding..current)."""
    from pyspark.sql import Window

    def _t(df: DataFrame) -> DataFrame:
        w = (
            Window.partitionBy(*partition)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return df.withColumn(out, _expr(expr).over(w))

    return _t


@register_op("tumbling_window")
def _tumbling(ts_col: str, duration: str, keys: list[str], aggs: dict[str, str]) -> Transform:
    from deva_spark.operators.windows import tumbling_time_window

    return tumbling_time_window(
        ts_col, duration, keys, {n: _expr(e) for n, e in aggs.items()}
    )


@register_op("priority_route")
def _priority_route(score_expr: str, bands: dict[str, float]) -> Transform:
    """SignalStream priority routing analog (`naja/signal/stream.py:19-239`):
    tag each row with the highest band whose threshold the score meets."""

    def _t(df: DataFrame) -> DataFrame:
        score = _expr(score_expr)
        out = F.lit("low")
        for name, threshold in sorted(bands.items(), key=lambda kv: kv[1]):
            out = F.when(score >= threshold, F.lit(name)).otherwise(out)
        return df.withColumn("priority", out)

    return _t


@dataclass
class PipelineSpec:
    """A named, JSON-able pipeline: source table + list of op steps."""

    name: str
    source: str
    steps: list[dict[str, Any]] = field(default_factory=list)


def compile_pipeline(spec: PipelineSpec) -> Transform:
    """Resolve every step through the registry and compose one transform."""
    transforms: list[Transform] = []
    for step in spec.steps:
        params = dict(step)
        op = params.pop("op")
        if op not in _REGISTRY:
            raise KeyError(f"unknown op {op!r}; registered: {sorted(_REGISTRY)}")
        transforms.append(_REGISTRY[op](**params))

    def _t(df: DataFrame) -> DataFrame:
        for t in transforms:
            df = t(df)
        return df

    return _t


def run_pipeline(spark, spec: PipelineSpec) -> DataFrame:
    """Execute a spec against its source table (must be registered in the
    catalog — `deva_spark.session.register_views`)."""
    return spark.table(spec.source).transform(compile_pipeline(spec))
