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


#: Fail-loud ceiling on the ELEMENT COUNT (rows × width) a literal-fold
#: renderer will inline into plan text. The zero-shuffle literal-codebook
#: plans are free at codebook scale (K·d ≤ tens of thousands: the plan
#: renders in milliseconds and codegen stays inside the JIT budget), but
#: plan-text bytes grow ~20·K·d and plan build/analysis/codegen become
#: the cliff long before the avoided shuffle would have hurt — at
#: production IVF scale (K ≈ 10⁴–10⁵ cells × 768 dims ⇒ 10⁷–10⁸
#: elements, hundreds of MB of SQL) the driver would stall for minutes.
#: Measured (PERF.md §22, N small enough that executor compute is
#: noise): the literal path's plan overhead vs the broadcast fallback
#: is ~2× total wall at 6.5×10⁴ elements, a 37 s driver stall at
#: 2.6×10⁵, 74 s at 5.2×10⁵, super-linear beyond — while the
#: broadcast-codebook fold join
#: (``operators/similarity.py::assign_cells_topn``'s fallback: ONE
#: 1-row broadcast crossJoin, zero shuffle, NO window, bit-equal)
#: builds in <1 s at every K. The default ceiling sits where the
#: one-time plan stall stops being tolerable (not at the small-N
#: crossover, ~1.6×10⁴, since at production N the literal plan cost
#: amortizes over the scan and keeps whole-stage codegen); oversize
#: codebooks must either go through the fallback or raise here —
#: never silently render a 100 MB plan.
MAX_LITERAL_MAT_ELEMS = 262_144


def _guard_lit_elems(n_elems: int, max_elems: int | None) -> None:
    cap = MAX_LITERAL_MAT_ELEMS if max_elems is None else max_elems
    if cap is not None and n_elems > cap:
        raise ValueError(
            f"literal matrix of {n_elems} elements exceeds the plan-size "
            f"ceiling ({cap}): inlining it would render ~{20 * n_elems // 1_000_000} MB "
            "of SQL and stall plan build/codegen. Use the broadcast-"
            "codebook fold join instead (assign_cells_topn switches "
            "automatically above the ceiling; for other renderers pass "
            "the codebook as a broadcast 1-row table), or raise "
            "max_elems explicitly if the size is intentional"
        )


def dlit(x: float) -> str:
    """SQL text of a double literal. ``repr`` round-trips doubles
    exactly and Spark's string→double cast is Java ``parseDouble``
    (constant-folded at plan time), so the parsed value is bit-equal
    to ``F.lit(float(x))``."""
    return f"CAST('{float(x)!r}' AS DOUBLE)"


def sql_dot_lit(vec_col: str, cvec: list[float], lo: int = 0) -> str:
    """SQL text of ``dot(slice(vec, lo+1, len(cvec)), cvec)`` — the
    exact left fold :func:`dot` computes (0.0 seed, in-order adds), but
    UNROLLED so a table of thousands of literal dots parses in ONE
    ``F.expr`` call instead of thousands of py4j ``Column``
    constructions (measured ~13 s of driver-side plan-build per IVFPQ
    probe at m=32×16 codes before this; ~0.1 s after).
    ``try_element_at`` mirrors ``zip_with``'s NULL-on-missing padding
    without tripping ANSI bounds errors.

    Prefer :func:`sql_dot_rows` for TABLES of literal dots: a plan
    with thousands of unrolled terms blows the JIT/codegen method
    budget and pays seconds of compilation per query (measured 2.8 s
    vs 0.3 s for the 16×64 JL matrix); this form is right only for a
    handful of entries."""
    terms = " + ".join(
        f"CAST(try_element_at(`{vec_col}`, {lo + i + 1}) AS DOUBLE) * {dlit(c)}"
        for i, c in enumerate(cvec)
    )
    return f"(0D + {terms})"


def sql_lit_mat(rows: list[list[float]], max_elems: int | None = None) -> str:
    """SQL text of a 2-D double-literal array. Raises above the
    :data:`MAX_LITERAL_MAT_ELEMS` plan-size ceiling (see there);
    ``max_elems`` overrides it (``None`` = module default)."""
    _guard_lit_elems(sum(len(r) for r in rows), max_elems)
    return (
        "array("
        + ",".join(
            "array(" + ",".join(dlit(x) for x in row) + ")" for row in rows
        )
        + ")"
    )


def sql_dot_rows(
    vec_col: str,
    rows: list[list[float]],
    lo: int = 0,
    max_elems: int | None = None,
) -> str:
    """SQL text of ``array(dot(slice(vec, lo+1, w), row) for row in
    rows)`` — the whole literal-dot table as ONE higher-order fold over
    a 2-D literal matrix. Same bit-exact 0.0-seeded left fold as
    :func:`dot` (unit-verified element-for-element), but the generated
    method stays small: the fully unrolled form at 16×64 terms spent
    ~2.3 s in codegen per query while this runs in ~0.3 s, and the
    parse is still a single ``F.expr`` call."""
    w = len(rows[0])
    return (
        f"transform({sql_lit_mat(rows, max_elems)}, "
        f"r -> aggregate(zip_with(slice(`{vec_col}`, {lo + 1}, {w}), r, "
        "(x, y) -> CAST(x AS DOUBLE) * y), 0D, (acc, t) -> acc + t))"
    )


def sql_l2_norm(vec_col: str) -> str:
    """SQL text of :func:`l2_norm` — the identical fold."""
    return (
        f"sqrt(aggregate(`{vec_col}`, 0D, "
        "(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    )


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
