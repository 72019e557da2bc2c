"""Table statistics: the ANALYZE step a measured planner consumes.

`skew.auto_join` probes at call time; a scheduled pipeline wants the
probe amortized — collect once per table refresh, persist a tiny JSON
sidecar, and let every planning decision (broadcast threshold, skew
salting, bucket count, z-order column pick) read numbers instead of
guessing. One pass over the table: row count plus per-column null
count, min/max (orderable types), and approximate NDV
(``approx_count_distinct`` — HLL-based, engine-private, which is fine
here: planner stats never cross engines, unlike the oracle-checked KMV
sketch tier). Output is bounded by the column count, never data-sized.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ORDERABLE = ("int", "bigint", "smallint", "tinyint", "double", "float",
              "date", "timestamp", "string", "decimal")


def collect_table_stats(
    df: DataFrame, columns: list[str] | None = None
) -> dict:
    """One-aggregate stats pass. Returns ``{"rows": n, "columns":
    {name: {"ndv": ..., "nulls": ..., "min": ..., "max": ...}}}`` with
    min/max omitted for non-orderable types (arrays, structs)."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__rows")]
    orderable = {}
    for c in cols:
        dt = df.schema[c].dataType.simpleString()
        orderable[c] = dt.startswith(_ORDERABLE)
        aggs.append(F.approx_count_distinct(c).alias(f"__ndv_{c}"))
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nul_{c}")
        )
        if orderable[c]:
            aggs.append(F.min(c).alias(f"__mn_{c}"))
            aggs.append(F.max(c).alias(f"__mx_{c}"))
    row = df.agg(*aggs).collect()[0]
    out = {"rows": row["__rows"], "columns": {}}
    for c in cols:
        st = {"ndv": row[f"__ndv_{c}"], "nulls": row[f"__nul_{c}"]}
        if orderable[c]:
            st["min"], st["max"] = row[f"__mn_{c}"], row[f"__mx_{c}"]
        out["columns"][c] = st
    return out


def write_table_stats(df: DataFrame, table_path: str,
                      columns: list[str] | None = None) -> dict:
    """Collect and persist stats as ``<table>/_table_stats.json``
    (atomic rename — the snapshots manifest discipline). Values
    serialize via ``str`` for types JSON lacks (dates, decimals)."""
    stats = collect_table_stats(df, columns)
    tmp = os.path.join(table_path, "_table_stats.json.tmp")
    final = os.path.join(table_path, "_table_stats.json")
    with open(tmp, "w") as fh:
        json.dump(stats, fh, default=str)
    os.rename(tmp, final)
    return stats


def read_table_stats(table_path: str) -> dict | None:
    """The persisted sidecar, or None if the table was never analyzed."""
    p = os.path.join(table_path, "_table_stats.json")
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)
