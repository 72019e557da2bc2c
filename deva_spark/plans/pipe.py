"""`>>` pipe DSL over DataFrames.

Reference surface: the operator-overloaded dataflow DSL — ``x >> stream``
ingestion (`/root/reference/deva/core/core.py:866-877`), ``stream >> sink``
dispatch (`core/core.py:1013-1058`), eager pipe expressions ``data >>
P.map(f) >> to_list`` (`pipe.py:109-161`), ``@P`` lifting (`pipe.py:207-241`),
function composition with ``+`` (`pipe.py:174-201`).

Here the DSL is sugar over ``DataFrame.transform``: an :class:`EventStream`
wraps a DataFrame; ``>>`` applies a transform (any ``DataFrame ->
DataFrame`` callable, including every operator in ``deva_spark.operators``)
and stays lazy — the "pipe expression" IS the Catalyst plan, so chaining
adds zero execution cost. Terminal sinks (``to_list`` etc.) are actions.

>>> from deva_spark.plans import P
>>> from deva_spark.operators import core as C
>>> (P(df) >> C.where(F.col("x") > 2) >> C.project("x")).to_list()
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame


class Sink:
    """Terminal marker: ``stream >> sink`` runs an action."""

    def __init__(self, fn: Callable[[DataFrame], Any], name: str = "sink"):
        self.fn = fn
        self.name = name

    def __call__(self, df: DataFrame) -> Any:
        return self.fn(df)


#: materializer sinks (pipe.py:243-274 `to_dataframe`, `as_list`, ...)
to_list = Sink(lambda df: [tuple(r) for r in df.collect()], "to_list")
to_pandas = Sink(lambda df: df.toPandas(), "to_pandas")
to_count = Sink(lambda df: df.count(), "count")
show = Sink(lambda df: df.show(), "show")


class EventStream:
    """A lazy stream of rows = a wrapped DataFrame.

    ``es >> transform`` → new EventStream (lazy plan extension)
    ``es >> Sink``      → action result
    ``es >> [list]``    → append collected rows into the list (the
                          reference's ``stream >> list`` sink,
                          `core/core.py:1013-1058`)
    ``es >> "name"``    → register as temp view under the name (NS analog)
    """

    def __init__(self, df: DataFrame):
        self.df = df

    def __rshift__(self, other):
        if isinstance(other, Sink):
            return other(self.df)
        if isinstance(other, list):
            other.extend(tuple(r) for r in self.df.collect())
            return other
        if isinstance(other, str):
            self.df.createOrReplaceTempView(other)
            return self
        if callable(other):
            return EventStream(self.df.transform(other))
        raise TypeError(f"cannot pipe EventStream into {type(other)!r}")

    # fluent operator methods mirroring the reference's Stream API
    # (s.map(f).filter(p).sink(...), core/core.py:1326-1554) — each returns
    # a new lazy EventStream over the extended plan
    def map(self, *cols) -> "EventStream":
        """``Stream.map`` analog: projection/derivation via Column exprs."""
        return EventStream(self.df.select(*cols))

    def filter(self, cond) -> "EventStream":
        return EventStream(self.df.filter(cond))

    def remove(self, cond) -> "EventStream":
        """``Stream.remove`` analog: inverted filter."""
        return EventStream(self.df.filter(~cond))

    def pluck(self, *fields: str) -> "EventStream":
        return EventStream(self.df.select(*fields))

    def flatten(self, col: str, alias: str) -> "EventStream":
        from pyspark.sql import functions as F

        return EventStream(self.df.withColumn(alias, F.explode(col)))

    def unique(self, *keys: str) -> "EventStream":
        """``unique`` analog: representative-row dedup on keys."""
        return EventStream(self.df.dropDuplicates(list(keys)))

    def sink(self, fn) -> Any:
        """``Stream.sink`` analog: apply fn to the materialized rows."""
        return fn(self.df.collect())

    # small conveniences mirroring the eager pipe materializers
    def to_list(self) -> list:
        return to_list(self.df)

    def to_pandas(self):
        return to_pandas(self.df)

    def count(self) -> int:
        return to_count(self.df)

    def explain(self, mode: str = "formatted") -> None:
        self.df.explain(mode)

    def visualize(self, path: str | None = None, physical: bool = False) -> str:
        """``visualize()`` analog (`graph.py:63-320`): DOT graph of this
        stream's plan (see :mod:`deva_spark.plans.graph`)."""
        from deva_spark.plans.graph import visualize

        return visualize(self.df, path=path, physical=physical)


def P(df: DataFrame) -> EventStream:  # noqa: N802 — mirrors the reference's P
    """Lift a DataFrame into the pipe DSL (``@P`` analog, `pipe.py:207-241`)."""
    return EventStream(df)


def compose(*ops: Callable[[DataFrame], DataFrame]) -> Callable[[DataFrame], DataFrame]:
    """Function composition (``f + g`` analog, `pipe.py:174-201`): one
    transform applying each op left-to-right."""

    def _t(df: DataFrame) -> DataFrame:
        for op in ops:
            df = df.transform(op)
        return df

    return _t
