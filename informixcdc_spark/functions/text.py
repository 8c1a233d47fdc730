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
    """k-word shingles (space-joined), empty when fewer than k tokens.

    ``tok`` MUST be a materialized array column (not an inline
    tokenization expression): higher-order functions are interpreted —
    no common-subexpression elimination — so an inline ``split``/
    ``filter`` here would re-tokenize the document once per shingle
    position, turning a linear pass quadratic."""
    idx = F.sequence(F.lit(1), F.size(tok) - (k - 1))
    make = lambda i: F.array_join(F.slice(tok, i, k), " ")  # noqa: E731
    return F.when(F.size(tok) >= k, F.transform(idx, make)).otherwise(
        F.array().cast("array<string>")
    )


def hash16(col: Column, seed: int | None = None) -> Column:
    """First 16 hex chars of md5 (optionally seeded) — 64 bits of hash as
    a fixed-width string; lexicographic order == numeric order."""
    base = col if seed is None else F.concat(F.lit(f"{seed}|"), col)
    return F.substring(F.md5(base), 1, 16)


#: Modulus of the minhash universal-hash family h_j(x) = (a_j·x + b_j) mod P.
#: With x < 2^32 (first 8 md5 hex chars) and a_j < P < 2^30, the product
#: stays below 2^62 — no 64-bit overflow in Spark OR DuckDB, so the
#: arithmetic is engine-exact.
MINHASH_PRIME = 1_000_000_007


def minhash_coeffs(n: int) -> list[tuple[int, int]]:
    """Deterministic (a_j, b_j) pairs for n universal hash functions.
    Shared by the Spark expressions and the generated oracle SQL so the
    two can never diverge."""
    return [(40_503_001 * (j + 1) + 7, 104_729 * (j + 1) + 3) for j in range(n)]


def shingle_hash_ints(shingle_arr: Column) -> Column:
    """One 32-bit base hash per shingle (array<long>), from which every
    minhash function is derived arithmetically. This is the ONLY md5 on
    the signature path — the classic 'hash once, permute cheaply'
    minhash construction; the 8-seeded-md5s-per-shingle alternative costs
    8× the hashing at 100 TB."""
    return F.transform(
        shingle_arr,
        lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long"),
    )


def minhash_int(xs: Column, a: int, b: int) -> Column:
    """One minhash signature: min over base hashes of (a·x + b) mod P."""
    return F.array_min(
        F.transform(xs, lambda x: (x * F.lit(a) + F.lit(b)) % F.lit(MINHASH_PRIME))
    )
