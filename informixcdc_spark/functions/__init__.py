"""Reusable column-expression helpers (all JVM-side, codegen-friendly)."""

from informixcdc_spark.functions.numeric import davg, dsum
from informixcdc_spark.functions.vector import cosine_similarity, dot, l2_norm

__all__ = ["dsum", "davg", "dot", "l2_norm", "cosine_similarity"]
