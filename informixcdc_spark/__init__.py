"""informixcdc_spark — a PySpark-native analytics & CDC engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference CDC client ``aford4074/informixcdc`` (an ESQL/C CPython
extension that pumps an Informix change-data-capture byte stream into
Python dicts; see ``/root/reference/ext/_informixcdcmodule.ec``), plus
the relational query surface the reference delegates to the Informix
server (we delegate to Spark SQL / Catalyst), plus large-scale
training-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis).

Layout:

- :mod:`informixcdc_spark.session`   — tuned ``SparkSession`` factory
- :mod:`informixcdc_spark.catalog`   — fixture-table loading / view registry
- :mod:`informixcdc_spark.cdc`       — change-record data model, decoders,
  savepoint semantics, batch CDC apply (reference parity layer)
- :mod:`informixcdc_spark.streaming` — Structured Streaming CDC pipeline
  (exactly-once materialization)
- :mod:`informixcdc_spark.operators` — extension operators (dedup,
  similarity search, text analysis, multimodal)
- :mod:`informixcdc_spark.functions` — reusable column-expression helpers
- :mod:`informixcdc_spark.queries`   — the named query surface exposed to
  the driver via ``__spark_entry__.py`` (queries + DuckDB oracle SQL)
"""

__version__ = "0.1.0"


class CdcError(RuntimeError):
    """Engine-level error, exported as module-level ``error`` for drop-in
    parity with the reference's ``informixcdc.error`` exception object
    (``PyErr_NewException("informixcdc.error", ...)``,
    ``ext/_informixcdcmodule.ec:2613-2620``): a consumer's
    ``except informixcdc.error`` becomes
    ``except informixcdc_spark.error`` unchanged. Subclasses
    ``RuntimeError`` because that is what engine misuse raised before the
    alias existed. (The reference's ``Str``/``Null`` exports are vestigial
    C-skeleton remnants and intentionally have no counterpart here —
    SURVEY.md §2.7.)"""


error = CdcError
