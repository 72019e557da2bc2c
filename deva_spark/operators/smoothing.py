"""Sequential smoothing operators (EWMA family).

Reference surface: the naja signal layer smooths scores/indicators with
pandas rolling/ewm over per-key series (strategy feature pipelines,
`/root/reference/deva/naja/strategy/declarative.py` feature steps operate
on per-symbol pandas frames).

An exponential moving average is an inherently sequential fold
(s_t = α·x_t + (1-α)·s_{t-1}) — not expressible as a SQL window frame —
so this is the textbook ``applyInPandas`` grouped-map case: one shuffle
on the key, then a vectorized pandas ``ewm`` per group. Keys shard across
executors; each group must fit one task (same bound as any per-key
window). Streaming twin: the running state is one float per key
(streaming/stateful.py pattern).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame


def ewma(
    alpha: float,
    value: str = "value",
    out: str = "ewma",
    partition: str = "user_id",
    order: tuple[str, str] = ("ts", "event_id"),
) -> Callable[[DataFrame], DataFrame]:
    """Per-key EWMA in event order: adjust=False recursive form, the
    stream-semantics variant (each output depends only on the past)."""

    def _t(df: DataFrame) -> DataFrame:
        from pyspark.sql.types import DoubleType, StructField, StructType

        out_schema = StructType(df.schema.fields + [StructField(out, DoubleType())])

        def run(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(list(order))
            pdf[out] = pdf[value].ewm(alpha=alpha, adjust=False).mean()
            return pdf

        return df.groupBy(partition).applyInPandas(run, schema=out_schema)

    return _t
