"""Local stand-in for the driver's DuckDB-oracle comparison.

Runs a named Spark query and its oracle SQL side by side, normalizes both
results (sort columns by name, sort rows, canonicalize cell values) and
diffs them. Mirrors the driver contract: row-count + schema +
order-insensitive value hash. Used by tests so every oracle mismatch is
caught locally before a round's CORRECTNESS report.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math

import duckdb
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _canon_cell(v):
    """Canonicalize a cell, TYPE-STRICTLY.

    Numeric kinds are tagged ("b"/"i"/"f"/"d") so int64 `123` never
    compares equal to float64 `123.0` — the driver's value hash is
    type-sensitive, and Python tuple equality (1 == 1.0) let exactly
    that class of mismatch (r1: e23/e24/e26) pass locally while
    failing the driver.
    """
    if v is None:
        return None
    # array-valued cells: Spark gives lists, DuckDB numpy arrays —
    # canonicalize both to tuples of canonical elements
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_canon_cell(x) for x in v)
    tname = type(v).__name__
    if isinstance(v, bool) or tname == "bool_":
        return ("b", bool(v))
    if tname in ("float32", "float64"):  # numpy scalars inside arrays
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return ("f", v + 0.0)  # normalize -0.0
    if isinstance(v, int) or tname in (
        "int8",
        "int16",
        "int32",
        "int64",
        "uint8",
        "uint16",
        "uint32",
        "uint64",
    ):
        return ("i", int(v))
    if isinstance(v, decimal.Decimal):
        return ("d", v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None)
    return v


def canonicalize(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = [tuple(_canon_cell(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows, key=lambda r: tuple(str(x) for x in r))


def compare(spark_df, oracle_sql: str, sf_dir: str) -> tuple[bool, str]:
    sp = spark_df.toPandas()
    dk = duckdb_run(oracle_sql, sf_dir)
    if sorted(sp.columns) != sorted(dk.columns):
        return False, f"columns differ: spark={sorted(sp.columns)} duckdb={sorted(dk.columns)}"
    if len(sp) != len(dk):
        return False, f"row counts differ: spark={len(sp)} duckdb={len(dk)}"
    a, b = canonicalize(sp), canonicalize(dk)
    for i, (ra, rb) in enumerate(zip(a, b)):
        if ra != rb:
            return False, f"row {i} differs:\n  spark : {ra}\n  duckdb: {rb}"
    return True, "ok"
