"""Deterministic floating aggregates.

Summing doubles is order-dependent, and Spark's shuffle order differs
from any single-threaded engine — so a naive ``SUM(double)`` can differ
from the DuckDB oracle in the last few ulps. The fix used across the
query surface: round each term to a fixed decimal scale (cast to
``DECIMAL(18,s)`` — deterministic for any IEEE double because a decimal
tie would require a binary-representable ``...5e-s`` fraction, which
does not exist), sum exactly in decimal, then cast the exact result back
to double. Both engines then produce bit-identical doubles regardless of
partitioning or evaluation order. This costs one decimal conversion per
row and keeps the aggregation itself in Tungsten's hash aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str, scale: int = 4) -> Column:
    """Order-insensitive exact sum of a double column (see module doc)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def davg(col: Column | str, scale: int = 4) -> Column:
    """Order-insensitive average: exact decimal sum / count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double") / F.count(c)


def sql_dsum(expr: str, scale: int = 4) -> str:
    """ANSI-SQL rendering of :func:`dsum` for the DuckDB oracle."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 4) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE) / COUNT({expr})"
