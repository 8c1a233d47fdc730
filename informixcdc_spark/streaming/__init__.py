"""Structured Streaming CDC pipeline (SURVEY.md §3.4's Spark analog)."""

from informixcdc_spark.streaming.pipeline import CdcEngine, Materializer

__all__ = ["CdcEngine", "Materializer"]
