"""Structured Streaming twins of the stream-operator surface.

The reference engine is push-based processing-time streaming
(`/root/reference/deva/core/core.py:717-759`); this package upgrades the
same operators to event time + watermarks on Spark's micro-batch model
(SURVEY.md §2.10). One operator library, two execution modes: the batch
expressions in ``deva_spark.operators`` are reused verbatim where Spark
allows, and every streaming query is equivalence-tested against its batch
twin on the same rows (t1 smoke contract).
"""

from deva_spark.streaming import stateful, twin  # noqa: F401
