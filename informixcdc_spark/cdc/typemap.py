"""Informix column DDL → Spark schema + wire-walk metadata.

The reference receives table schemas at runtime as literal SQL column DDL
text inside CDC_REC_TABSCHEM records and turns the text into typed
column metadata by creating a temp table and DESCRIBE-ing it
(``ext/_informixcdcmodule.ec:1745-1783``). The Spark-native equivalent is
a direct parse into a ``StructType`` plus per-column wire metadata for
the row-image walk (fixed-length columns advance by ``col_size``,
var-length ones by a side-channel length array —
``ext/_informixcdcmodule.ec:1163-1218``).

Type matrix: SURVEY.md §1.4. Where the reference stubs a type out
(DECIMAL/DATETIME return the literal string "0.0" because the decode
path is dead code, ``ext/_informixcdcmodule.ec:18-22,1024-1126``), we
decode correctly and document the deliberate divergence. Unknown types
raise instead of being silently skipped (``ext/_informixcdcmodule.ec:
1128-1132`` falls through a stray break — a reference bug we do not
reproduce).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql.types import (
    BooleanType,
    DataType,
    DateType,
    DayTimeIntervalType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


@dataclass(frozen=True)
class WireColumn:
    """One column's decode plan for the row-image walk."""

    name: str
    ifx_type: str  # canonical informix type name
    col_size: int  # fixed wire width (0 for var-len)
    varlen: bool
    precision: int = 0
    scale: int = 0
    spark_type: DataType = StringType()


#: canonical informix type → (fixed wire size, spark type ctor)
#: wire sizes follow the reference's walk; see binary.py for layouts.
_FIXED = {
    "int8": (10, LongType),  # 2-byte sign + lo/hi halves (ec:444-445,816-843)
    "serial8": (10, LongType),
    "int": (4, IntegerType),  # 4-byte BE (ec:845-861)
    "integer": (4, IntegerType),
    "serial": (4, IntegerType),
    "bigint": (8, LongType),  # 8-byte BE (ec:956-971)
    "smallint": (2, ShortType),  # 2-byte BE (ec:1007-1022)
    "float": (8, DoubleType),  # 8-byte IEEE BE (ec:973-988)
    "double precision": (8, DoubleType),
    "smallfloat": (4, FloatType),  # 4-byte IEEE BE (ec:990-1005)
    "real": (4, FloatType),
    "date": (4, DateType),  # julian days, rjulmdy (ec:863-886)
    "boolean": (2, BooleanType),  # null-flag byte + value byte (ec:888-897)
    "decimal": (18, DecimalType),  # flag + scale + 16B unscaled (ours; ref stubs)
    "money": (18, DecimalType),
    "datetime": (9, TimestampType),  # flag + 8B BE epoch-micros (ours; ref stubs)
    "interval": (9, DayTimeIntervalType),  # flag + 8B BE span-micros (ours; ref stubs)
    "interval_ym": (5, IntegerType),  # flag + 4B BE signed months (ours; ref stubs)
}

_VARLEN = {"varchar", "nvarchar", "lvarchar"}

#: Informix day-time interval qualifier → Spark DayTimeIntervalType field
_DT_INTERVAL_FIELDS = {
    "day": DayTimeIntervalType.DAY,
    "hour": DayTimeIntervalType.HOUR,
    "minute": DayTimeIntervalType.MINUTE,
    "second": DayTimeIntervalType.SECOND,
    "fraction": DayTimeIntervalType.SECOND,  # FRACTION = sub-second digits
}

_INTERVAL_RE = re.compile(
    r"\s*(?P<name>\w+)\s+interval\s+"
    r"(?P<from>year|month|day|hour|minute|second|fraction)(?:\s*\(\s*\d+\s*\))?"
    r"\s+to\s+"
    r"(?P<to>year|month|day|hour|minute|second|fraction)(?:\s*\(\s*\d+\s*\))?\s*$",
    re.IGNORECASE,
)

_COL_RE = re.compile(
    r"\s*(?P<name>\w+)\s+(?P<type>[a-z0-9 ]+?)"
    r"(?:\s*\(\s*(?P<p>\d+)\s*(?:,\s*(?P<s>\d+)\s*)?\))?"
    r"(?:\s+year to \w+)?\s*$",
    re.IGNORECASE,
)


def parse_ddl(cols_desc: str) -> list[WireColumn]:
    """Parse Informix column DDL text (e.g. ``"a int, b varchar(8)"``)."""
    cols: list[WireColumn] = []
    for piece in _split_top_level(cols_desc):
        iv = _INTERVAL_RE.match(piece)
        if iv:
            frm = iv.group("from").lower()
            to = iv.group("to").lower()
            ym_frm = frm in ("year", "month")
            ym_to = to in ("year", "month")
            if ym_frm != ym_to:
                # Informix intervals are one class or the other; a
                # qualifier spanning both (e.g. "year to day") is
                # ill-formed DDL — stays loud, never guessed at.
                raise ValueError(
                    f"unsupported informix type: interval {frm} to {to} "
                    "(mixes the year-month and day-time classes)"
                )
            if ym_frm:
                # year-month interval: decoded as the SIGNED TOTAL MONTH
                # COUNT (IntegerType) — lossless (a YM interval IS a
                # month count; years = months // 12). The reference
                # never decodes either interval class (its INTERVAL
                # path is the same dead "0.0" stub as DATETIME,
                # ext/_informixcdcmodule.ec:1073-1126). We do NOT use
                # Spark's YearMonthIntervalType because PySpark 4.1
                # leaves its fromInternal unimplemented — YM-typed
                # values cannot cross the Python boundary; the month
                # count representation carries the same information
                # through any engine (cast with make_ym_interval(0, m)
                # JVM-side when the Catalyst type is wanted).
                size, ctor = _FIXED["interval_ym"]
                cols.append(
                    WireColumn(
                        iv.group("name").lower(),
                        "interval_ym",
                        size,
                        False,
                        0,
                        0,
                        ctor(),
                    )
                )
                continue
            size, _ = _FIXED["interval"]
            cols.append(
                WireColumn(
                    iv.group("name").lower(),
                    "interval",
                    size,
                    False,
                    0,
                    0,
                    DayTimeIntervalType(
                        _DT_INTERVAL_FIELDS[frm], _DT_INTERVAL_FIELDS[to]
                    ),
                )
            )
            continue
        m = _COL_RE.match(piece)
        if not m:
            raise ValueError(f"unparseable column DDL: {piece!r}")
        name = m.group("name").lower()
        ifx = " ".join(m.group("type").lower().split())
        # normalize 'datetime year to fraction' handled by regex suffix
        p = int(m.group("p") or 0)
        s = int(m.group("s") or 0)
        if ifx in _VARLEN:
            cols.append(WireColumn(name, ifx, 0, True, p, s, StringType()))
        elif ifx in ("char", "character", "nchar"):
            cols.append(WireColumn(name, "char", max(p, 1), False, p, s, StringType()))
        elif ifx in _FIXED:
            size, ctor = _FIXED[ifx]
            if ctor is DecimalType:
                spark_t: DataType = DecimalType(p or 16, s)
            else:
                spark_t = ctor()
            cols.append(WireColumn(name, ifx, size, False, p, s, spark_t))
        else:
            # reference silently skips unknown types (stray break at
            # ec:1129) — we fail loudly instead
            raise ValueError(f"unsupported informix type: {ifx!r}")
    return cols


def _split_top_level(s: str) -> list[str]:
    """Split column list on commas not inside parentheses."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return [p for p in (x.strip() for x in out) if p]


def to_struct(cols: list[WireColumn]) -> StructType:
    return StructType([StructField(c.name, c.spark_type, True) for c in cols])


def schema_from_ddl(cols_desc: str) -> StructType:
    """The one-call replacement for the reference's temp-table DESCRIBE
    trick (``ext/_informixcdcmodule.ec:1745-1783``)."""
    return to_struct(parse_ddl(cols_desc))
