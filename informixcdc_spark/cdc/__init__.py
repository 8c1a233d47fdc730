"""CDC layer — the reference-parity core.

The reference (aford4074/informixcdc) is a CDC client that turns an
Informix change-log byte stream into typed per-event records and
maintains exactly-once restart state (see SURVEY.md §0–§2). This package
re-expresses that pipeline Spark-first:

- :mod:`informixcdc_spark.cdc.model`    — record-type tags + changelog schema
- :mod:`informixcdc_spark.cdc.typemap`  — Informix DDL → Spark StructType
  (the one-call replacement for the reference's temp-table DESCRIBE trick)
- :mod:`informixcdc_spark.cdc.binary`   — binary envelope/row-image codec
  (vectorized decode of the wire format)
- :mod:`informixcdc_spark.cdc.generator`— deterministic changelog fixtures
- :mod:`informixcdc_spark.cdc.apply`    — batch net-effect application of a
  changelog (transaction assembly, replay discard, truncate, upsert)
- :mod:`informixcdc_spark.cdc.savepoints` — restart-state bookkeeping
  (opntxns / lsttxn analogs)
- :mod:`informixcdc_spark.cdc.ivm`      — incremental aggregate-view
  maintenance from changelog deltas
- :mod:`informixcdc_spark.cdc.history`  — SCD2 row-version history +
  point-in-time (`as_of`) reads
- :mod:`informixcdc_spark.cdc.compact`  — changelog compaction
  (snapshot + unsettled tail replaces the log prefix)
"""

from informixcdc_spark.cdc.apply import apply_changes, apply_changes_by_table
from informixcdc_spark.cdc.compact import compact_changelog
from informixcdc_spark.cdc.history import as_of, history_table
from informixcdc_spark.cdc.ivm import (
    aggregate_view,
    finalize_view,
    incremental_aggregate_view,
)
from informixcdc_spark.cdc.model import RecordType
from informixcdc_spark.cdc.registry import EpochRegistry

__all__ = [
    "apply_changes",
    "apply_changes_by_table",
    "EpochRegistry",
    "RecordType",
    "aggregate_view",
    "as_of",
    "compact_changelog",
    "finalize_view",
    "history_table",
    "incremental_aggregate_view",
]
