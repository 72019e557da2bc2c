"""Readers and sink writers (scan/sink operator families, SURVEY.md §2.1/§2.9)."""

from deva_spark.sources import readers, writers  # noqa: F401
