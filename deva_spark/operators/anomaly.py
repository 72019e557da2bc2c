"""Anomaly / drift detection operators.

Reference surface: Welford z-score scan (`/root/reference/deva/naja/radar/
engine.py:264-298` — online mean/M2 per key, flag |z| >= 3 after 30 obs) and
ADWIN drift (`radar/engine.py:241-263`).

Batch formulation: per-key moments via one hash aggregate, broadcast back
onto the events — the classic two-pass z-score. The aggregate side is tiny
(one row per key), so the join is a broadcast: the fact table never
shuffles twice. Streaming twin: transformWithState carrying Welford/ADWIN
state per key (streaming/stateful.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zscore_flags(
    key: str = "user_id",
    value: str = "value",
    min_obs: int = 30,
    threshold: float = 3.0,
) -> Callable[[DataFrame], DataFrame]:
    """Flag rows whose value is >= ``threshold`` sample standard deviations
    from the per-key mean, for keys with at least ``min_obs`` observations."""

    def _t(df: DataFrame) -> DataFrame:
        stats = df.groupBy(key).agg(
            F.avg(value).alias("_m"),
            F.stddev_samp(value).alias("_sd"),
            F.count(F.lit(1)).alias("_c"),
        )
        return (
            df.join(F.broadcast(stats), key)
            .filter(
                (F.col("_c") >= min_obs)
                & (F.col("_sd") > 0)
                & (F.abs((F.col(value) - F.col("_m")) / F.col("_sd")) >= threshold)
            )
            .drop("_m", "_sd", "_c")
        )

    return _t
