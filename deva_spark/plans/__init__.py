"""Plan-level surface: the `>>` pipe DSL and the declarative pipeline
spec runner (naja StrategyEngine analog)."""

from deva_spark.plans.pipe import P, EventStream  # noqa: F401
from deva_spark.plans.pipeline import PipelineSpec, run_pipeline  # noqa: F401
