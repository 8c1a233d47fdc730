"""Text column-expression helpers shared by the extension operators.

Everything here is a pure Spark column expression (JVM-side, codegen) —
and every primitive has an exact ANSI-SQL twin so the DuckDB oracle can
reproduce values bit-for-bit: tokenization is whitespace split, hashes
are md5-hex (identical in any engine), minhash minima are lexicographic
string minima over fixed-width hex.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: Column | str) -> Column:
    """Whitespace tokens, empty strings dropped."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, " "), lambda t: t != "")


def normalize(col: Column | str) -> Column:
    """Canonical text: lowercase, strip non-alnum (keep spaces), collapse
    whitespace, trim — the normalization step before fingerprinting."""
    c = F.col(col) if isinstance(col, str) else col
    x = F.lower(c)
    x = F.regexp_replace(x, "[^a-z0-9 ]", "")
    x = F.regexp_replace(x, " +", " ")
    return F.trim(x)


def fingerprint(col: Column | str) -> Column:
    """Deterministic 128-bit content fingerprint of normalized text."""
    return F.md5(normalize(col))


def word_shingles(tok: Column, k: int = 3) -> Column:
    """k-word shingles (space-joined), empty when fewer than k tokens."""
    idx = F.sequence(F.lit(1), F.size(tok) - (k - 1))
    make = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(tok, i + off) for off in range(k)]
    )
    return F.when(F.size(tok) >= k, F.transform(idx, make)).otherwise(
        F.array().cast("array<string>")
    )


def hash16(col: Column, seed: int | None = None) -> Column:
    """First 16 hex chars of md5 (optionally seeded) — 64 bits of hash as
    a fixed-width string; lexicographic order == numeric order."""
    base = col if seed is None else F.concat(F.lit(f"{seed}|"), col)
    return F.substring(F.md5(base), 1, 16)


def minhash(shingle_arr: Column, seed: int) -> Column:
    """One minhash signature value: min seeded hash over the shingle set."""
    return F.array_min(F.transform(shingle_arr, lambda s: hash16(s, seed)))
