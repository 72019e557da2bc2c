"""Named-object registry (namespace analog).

Reference surface: global singleton namespaces NS/NT/NB/NW — name →
stream / redis topic / sqlite table / web view
(`/root/reference/deva/core/namespace.py:56-118`, `148-287`) and the
well-known buses `log`/`warn`/`bus` (`core/bus.py:335-336`, `468-521`).

Spark mapping: the catalog is the namespace. A name resolves to
  * a temp view over a DataFrame (in-memory stream node, NS),
  * a parquet table path (durable table, NB),
  * a running streaming query by name (topic with live consumers, NT).

This registry is a thin convenience layer over those three; nothing here
is stateful beyond the catalog itself.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from deva_spark.sources import writers


@dataclass
class Namespace:
    """Per-session named registry: ``ns['name']`` → DataFrame."""

    spark: SparkSession
    tables: dict[str, str] = field(default_factory=dict)  # name -> parquet path

    # NS analog: name → live DataFrame (temp view)
    def put(self, name: str, df: DataFrame) -> DataFrame:
        df.createOrReplaceTempView(name)
        return df

    def get(self, name: str) -> DataFrame:
        if name in self.tables:
            return self.spark.read.parquet(self.tables[name])
        return self.spark.table(name)

    __setitem__ = None  # assignment via put (needs the df argument anyway)

    def __getitem__(self, name: str) -> DataFrame:
        return self.get(name)

    def __contains__(self, name: str) -> bool:
        if name in self.tables:
            return True
        return any(t.name == name for t in self.spark.catalog.listTables())

    # NB analog: name → durable table
    def persist(self, name: str, df: DataFrame, path: str, ts_col: str = "ts") -> None:
        writers.append_events(df, path, ts_col=ts_col)
        self.tables[name] = path

    # NT analog: name → running streaming query
    def topic(self, name: str):
        for q in self.spark.streams.active:
            if q.name == name:
                return q
        raise KeyError(f"no active streaming query named {name!r}")

    def names(self) -> list[str]:
        views = [t.name for t in self.spark.catalog.listTables()]
        return sorted(set(views) | set(self.tables))
