"""Operator library: DataFrame -> DataFrame transforms.

Each module re-expresses one family from the reference's operator inventory
(SURVEY.md §2) as declarative Spark transforms — composable with
``df.transform(op)`` or the `>>` sugar in ``deva_spark.plans.pipe``.
"""

from deva_spark.operators import (  # noqa: F401
    aggregates,
    anomaly,
    core,
    dedup,
    joins,
    reshape,
    routing,
    sampling,
    windows,
)
