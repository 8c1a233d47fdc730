"""Vector math over ``ArrayType`` columns — pure column expressions.

All of these run JVM-side via higher-order functions (``zip_with`` +
``aggregate``), which fold left-to-right in index order — the same
evaluation order a scalar SQL engine uses, so results are reproducible
against the DuckDB oracle without any tolerance fudge. No UDFs: at 100 TB
a Python UDF on the similarity hot path would dominate the runtime.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array<numeric> columns (double, left fold)."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            _c(a),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity, NULL-safe on zero-norm vectors."""
    d = dot(a, b)
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb))
