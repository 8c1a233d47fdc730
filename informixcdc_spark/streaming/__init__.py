"""Structured Streaming CDC pipeline (SURVEY.md §3.4's Spark analog)."""

from informixcdc_spark.streaming.pipeline import (
    CdcEngine,
    Materializer,
    MultiTableMaterializer,
    ViewMaterializer,
)
from informixcdc_spark.streaming.statestore import (
    HadoopFsStateStore,
    ManifestStateStore,
    PosixStateStore,
    StateStore,
)

__all__ = [
    "CdcEngine",
    "HadoopFsStateStore",
    "ManifestStateStore",
    "Materializer",
    "MultiTableMaterializer",
    "PosixStateStore",
    "StateStore",
    "ViewMaterializer",
]
