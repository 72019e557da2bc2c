"""Skew mitigation: salted two-phase aggregation and bucketed co-location.

The reference is single-process, so skew never appears there; at 100 TB a
hot key (one user with 10⁹ events, one stopword shingle) turns a shuffle
into a straggler. Two standing mitigations beyond AQE's runtime skew-join
splitting:

  * salted aggregation — pre-aggregate on (key, salt) so a hot key's rows
    split across ``n_salts`` reducers, then combine the partials. Works
    for any algebraic aggregate (sum/count/min/max — and the DECIMAL money
    sums stay exact because decimal addition is associative).
  * bucketed tables (sources.writers.write_bucketed) — pre-shuffle once at
    write time; subsequent equi-joins on the bucket key need no exchange.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_group_agg(
    keys: Sequence[str],
    partials: dict[str, tuple[Column, Callable[[Column], Column]]],
    n_salts: int = 16,
) -> Callable[[DataFrame], DataFrame]:
    """Two-phase aggregation: phase 1 groups by (keys..., salt) — a hot key
    fans out over ``n_salts`` reducers — phase 2 combines partials by keys.

    ``partials`` maps output name -> (phase-1 aggregate, phase-2 combiner),
    e.g. ``{"total": (F.sum(col), F.sum), "c": (F.count(lit(1)), F.sum)}``.
    """

    def _t(df: DataFrame) -> DataFrame:
        salted = df.withColumn(
            "_salt", (F.rand(seed=42) * n_salts).cast("int")
        )
        phase1 = salted.groupBy(*keys, "_salt").agg(
            *[expr.alias(f"_p_{name}") for name, (expr, _) in partials.items()]
        )
        return phase1.groupBy(*keys).agg(
            *[
                comb(F.col(f"_p_{name}")).alias(name)
                for name, (_, comb) in partials.items()
            ]
        )

    return _t
