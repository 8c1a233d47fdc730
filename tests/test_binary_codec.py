"""Codec tests from the reference's type-coverage fixture
(sql/informixcdc_test.sql:7-28 boundary values; FIXTURES.md §1), plus
NULL variants of every column and the §2.8 fine print (CHAR padding kept,
DECIMAL exact — the reference stubs it, we don't)."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

from informixcdc_spark.cdc.binary import (
    decode_record,
    decode_row_image,
    decode_stream_df,
    encode_record,
    encode_row_image,
    split_stream,
)
from informixcdc_spark.cdc.model import RecordType
from informixcdc_spark.cdc.typemap import parse_ddl, schema_from_ddl

# the reference's 19-column fixture table, as Informix DDL
DDL = (
    "cdc_serial8 serial8, cdc_int8_low int8, cdc_int8_high int8, "
    "cdc_bigint_low bigint, cdc_bigint_high bigint, cdc_char char(16), "
    "cdc_date date, cdc_datetime datetime year to fraction, "
    "cdc_decimal_low decimal(32,16), cdc_decimal_high decimal(32,16), "
    "cdc_float_low float, cdc_float_high float, cdc_integer_low integer, "
    "cdc_integer_high integer, cdc_smallfloat_low smallfloat, "
    "cdc_smallfloat_high smallfloat, cdc_smallint_low smallint, "
    "cdc_smallint_high smallint, cdc_varchar varchar(255,16), "
    "cdc_lvarchar lvarchar(256), cdc_bool boolean"
)

BOUNDARY = {
    "cdc_serial8": 1,
    "cdc_int8_low": -9223372036854775807,
    "cdc_int8_high": 9223372036854775807,
    "cdc_bigint_low": -9223372036854775807,
    "cdc_bigint_high": 9223372036854775807,
    "cdc_char": "I heart CDC",
    "cdc_date": dt.date(2026, 8, 13),
    "cdc_datetime": dt.datetime(2026, 8, 13, 12, 34, 56, 789012),
    "cdc_decimal_low": Decimal("-1234567890123456.1234567890123456"),
    "cdc_decimal_high": Decimal("1234567890123456.1234567890123456"),
    "cdc_float_low": -99.99999999999999,
    "cdc_float_high": 99.99999999999999,
    "cdc_integer_low": -2147483647,
    "cdc_integer_high": 2147483647,
    "cdc_smallfloat_low": -99.5,
    "cdc_smallfloat_high": 99.5,
    "cdc_smallint_low": -32767,
    "cdc_smallint_high": 32767,
    "cdc_varchar": "varchar värde",
    "cdc_lvarchar": "l" * 200,
    "cdc_bool": True,
}


def test_ddl_parse():
    cols = parse_ddl(DDL)
    assert [c.name for c in cols][:3] == ["cdc_serial8", "cdc_int8_low", "cdc_int8_high"]
    by_name = {c.name: c for c in cols}
    assert by_name["cdc_char"].col_size == 16 and not by_name["cdc_char"].varlen
    assert by_name["cdc_varchar"].varlen and by_name["cdc_lvarchar"].varlen
    assert by_name["cdc_decimal_low"].precision == 32
    assert by_name["cdc_decimal_low"].scale == 16
    st = schema_from_ddl(DDL)
    assert st["cdc_datetime"].dataType.typeName() == "timestamp"
    assert st["cdc_decimal_high"].dataType.simpleString() == "decimal(32,16)"


def test_row_image_roundtrip_boundary_values():
    cols = parse_ddl(DDL)
    buf = encode_row_image(cols, BOUNDARY)
    out = decode_row_image(cols, buf, 0)
    # CHAR keeps its padding — NOT trimmed (ec:905)
    assert out["cdc_char"] == "I heart CDC     "
    assert len(out["cdc_char"]) == 16
    # DECIMAL decodes exactly (reference would return "0.0")
    assert out["cdc_decimal_low"] == Decimal("-1234567890123456.1234567890123456")
    assert out["cdc_decimal_high"] == Decimal("1234567890123456.1234567890123456")
    assert out["cdc_datetime"] == BOUNDARY["cdc_datetime"]
    for k, v in BOUNDARY.items():
        if k in ("cdc_char",):
            continue
        assert out[k] == v, k
    # smallfloat round-trips through float32
    assert abs(out["cdc_smallfloat_high"] - 99.5) < 1e-6


def test_row_image_all_nulls():
    cols = parse_ddl(DDL)
    values = {c.name: None for c in cols}
    out = decode_row_image(cols, encode_row_image(cols, values), 0)
    assert all(v is None for v in out.values())


def test_unknown_type_raises():
    import pytest

    with pytest.raises(ValueError, match="unsupported informix type"):
        parse_ddl("a blob")


def test_record_framing_and_dispatch():
    cols = parse_ddl("id int, name varchar(20)")
    img = encode_row_image(cols, {"id": 7, "name": "x"})
    stream = b"".join(
        [
            encode_record(RecordType.BEGINTX, seq=1, txid=9, start_time=123, user_id=4),
            encode_record(RecordType.INSERT, seq=2, txid=9, tabid=5, row_image=img),
            encode_record(RecordType.COMMTX, seq=3, txid=9, commit_time=456),
            encode_record(RecordType.TIMEOUT, seq=3),
            encode_record(RecordType.TABSCHEM, tabid=5, cols_desc="id int, name varchar(20)"),
        ]
    )
    recs = [decode_record(r, {5: cols}) for r in split_stream(stream)]
    assert [r["record_type"] for r in recs] == [
        "BEGINTX",
        "INSERT",
        "COMMTX",
        "TIMEOUT",
        "TABSCHEM",
    ]
    assert recs[0]["start_time"] == 123 and recs[0]["user_id"] == 4
    assert recs[1]["row"] == {"id": 7, "name": "x"}
    assert recs[2]["commit_time"] == 456
    assert recs[4]["cols_desc"] == "id int, name varchar(20)"


def test_bad_packet_scheme_rejected():
    import pytest

    rec = bytearray(encode_record(RecordType.TIMEOUT, seq=1))
    rec[8:12] = (99).to_bytes(4, "big")
    with pytest.raises(ValueError, match="bad packet scheme"):
        list(split_stream(bytes(rec)))


def test_decode_stream_df(spark):
    cols = parse_ddl("id int, name varchar(20)")
    recs = [
        encode_record(RecordType.BEGINTX, seq=1, txid=9),
        encode_record(
            RecordType.INSERT,
            seq=2,
            txid=9,
            tabid=5,
            row_image=encode_row_image(cols, {"id": 1, "name": "a"}),
        ),
        encode_record(
            RecordType.UPDBEF,
            seq=3,
            txid=9,
            tabid=5,
            row_image=encode_row_image(cols, {"id": 1, "name": "a"}),
        ),
        encode_record(
            RecordType.UPDAFT,
            seq=4,
            txid=9,
            tabid=5,
            row_image=encode_row_image(cols, {"id": 1, "name": "b"}),
        ),
        encode_record(RecordType.COMMTX, seq=5, txid=9),
    ]
    df = spark.createDataFrame([(r,) for r in recs], "record binary")
    out = decode_stream_df(df, {5: cols}, table_tabid=5, tabname="t").orderBy("seq_number")
    rows = out.collect()
    assert [r["record_type"] for r in rows] == [
        "BEGINTX",
        "INSERT",
        "UPDBEF",
        "UPDAFT",
        "COMMTX",
    ]
    assert rows[1]["row"]["name"] == "a" and rows[3]["row"]["name"] == "b"
    assert rows[1]["tabname"] == "t"

    # and the decoded stream feeds apply_changes end-to-end
    from informixcdc_spark.cdc.apply import apply_changes

    final = apply_changes(
        decode_stream_df(df, {5: cols}, table_tabid=5, tabname="t"), ["id"]
    ).collect()
    assert len(final) == 1 and final[0]["name"] == "b"


def test_discard_flags_on_txn_records():
    """Per-record replay markers match the reference's extractors
    (ext/_informixcdcmodule.ec:1459-1461,1527-1529,1585-1587):
    flag = seq_number < last_seq_number (the activate-time LSN)."""
    begin = encode_record(RecordType.BEGINTX, seq=10, txid=1)
    comm = encode_record(RecordType.COMMTX, seq=20, txid=1)
    rb = encode_record(RecordType.RBTX, seq=30, txid=2)

    # default last_seq_number=0 (reference init, ec:300): nothing discards
    assert decode_record(begin)["discard_candidate"] is False
    assert decode_record(comm)["discard_transaction"] is False
    assert decode_record(rb)["discard_transaction"] is False

    # after a restart with last committed seq 25: begin/commit replay, rbtx not
    assert decode_record(begin, last_seq_number=25)["discard_candidate"] is True
    assert decode_record(comm, last_seq_number=25)["discard_transaction"] is True
    assert decode_record(rb, last_seq_number=25)["discard_transaction"] is False

    # the flags never appear on the other record's dict, nor on IUD/DISCARD
    assert "discard_transaction" not in decode_record(begin, last_seq_number=25)
    assert "discard_candidate" not in decode_record(comm, last_seq_number=25)
    disc = encode_record(RecordType.DISCARD, seq=5, txid=3)
    d = decode_record(disc, last_seq_number=25)
    assert "discard_candidate" not in d and "discard_transaction" not in d


def test_with_discard_flags_columns(spark):
    from informixcdc_spark.cdc.apply import with_discard_flags

    cols = parse_ddl("id int")
    recs = [
        encode_record(RecordType.BEGINTX, seq=10, txid=1),
        encode_record(
            RecordType.INSERT,
            seq=11,
            txid=1,
            tabid=5,
            row_image=encode_row_image(cols, {"id": 1}),
        ),
        encode_record(RecordType.COMMTX, seq=12, txid=1),
        encode_record(RecordType.BEGINTX, seq=40, txid=2),
        encode_record(RecordType.RBTX, seq=41, txid=2),
    ]
    df = spark.createDataFrame([(r,) for r in recs], "record binary")
    log = decode_stream_df(df, {5: cols}, table_tabid=5, tabname="t")
    out = {
        r["seq_number"]: r
        for r in with_discard_flags(log, last_committed_seq=25).collect()
    }
    assert out[10]["discard_candidate"] is True  # begin before watermark
    assert out[12]["discard_transaction"] is True  # commit before watermark
    assert out[40]["discard_candidate"] is False
    assert out[41]["discard_transaction"] is False
    assert out[11]["discard_candidate"] is None  # IUD rows: NULL both
    assert out[11]["discard_transaction"] is None


def test_decoder_emits_discard_flag_columns(spark):
    """decode_stream_df threads last_seq_number into decode_record, so the
    flags arrive ON the decoded records (reference parity:
    ext/_informixcdcmodule.ec:1459-1461,1527-1529) — no separate
    with_discard_flags pass needed when the watermark is known at decode
    time."""
    cols = parse_ddl("id int")
    recs = [
        encode_record(RecordType.BEGINTX, seq=10, txid=1),
        encode_record(RecordType.COMMTX, seq=12, txid=1),
        encode_record(RecordType.BEGINTX, seq=40, txid=2),
        encode_record(RecordType.RBTX, seq=41, txid=2),
        encode_record(
            RecordType.INSERT,
            seq=11,
            txid=1,
            tabid=5,
            row_image=encode_row_image(cols, {"id": 1}),
        ),
    ]
    df = spark.createDataFrame([(r,) for r in recs], "record binary")
    log = decode_stream_df(df, {5: cols}, 5, "t", last_seq_number=25)
    out = {r["seq_number"]: r for r in log.collect()}
    assert out[10]["discard_candidate"] is True
    assert out[12]["discard_transaction"] is True
    assert out[40]["discard_candidate"] is False
    assert out[41]["discard_transaction"] is False
    assert out[11]["discard_candidate"] is None
    assert out[11]["discard_transaction"] is None


def test_split_stream_strict_rejects_torn_tail():
    """Chunk-stitching callers keep the lenient default (truncated tail
    withheld for the next chunk); complete-unit callers — the binlog
    source's per-file decode — pass strict=True and fail loudly on a
    torn tail instead of silently losing the final record (r4 ADVICE)."""
    import pytest

    full = encode_record(RecordType.TIMEOUT, seq=1) + encode_record(
        RecordType.TIMEOUT, seq=2
    )
    torn = full[:-5]
    # lenient: first record yielded, torn tail withheld
    assert len(list(split_stream(torn))) == 1
    # strict: the same buffer is an error naming the leftover bytes
    with pytest.raises(ValueError, match="truncated trailing frame"):
        list(split_stream(torn, strict=True))
    # a clean buffer passes strict
    assert len(list(split_stream(full, strict=True))) == 2


def test_binlog_source_rejects_truncated_capture_file(spark, tmp_path):
    """A torn capture file surfaces as a decode error through the data
    source, never as silent record loss."""
    import os

    from informixcdc_spark.sources.binlog import register_binlog_source

    path = str(tmp_path / "cap")
    os.makedirs(path)
    full = encode_record(RecordType.TIMEOUT, seq=1) + encode_record(
        RecordType.TIMEOUT, seq=2
    )
    with open(os.path.join(path, "part-00000.bin"), "wb") as fh:
        fh.write(full[:-5])
    register_binlog_source(spark)
    import pytest

    with pytest.raises(Exception, match="truncated trailing frame"):
        spark.read.format("cdc-binlog").option("path", path).load().collect()


def test_interval_ddl_and_roundtrip():
    """INTERVAL columns (the last SURVEY §1.4 type row), BOTH classes:
    day-time qualifiers map onto DayTimeIntervalType fields and the
    9-byte flag+span-micros layout round-trips negative spans, µs
    fractions and NULLs; year-month qualifiers decode as the SIGNED
    TOTAL MONTH COUNT (IntegerType — lossless; PySpark 4.1 leaves
    YearMonthIntervalType.fromInternal unimplemented, so the Catalyst
    YM type cannot cross the Python boundary) through a 5-byte
    flag+months layout; a qualifier mixing the classes fails loudly.
    (The reference's INTERVAL decode for BOTH classes is the dead
    "0.0" stub at ec:1073-1126 — we decode both correctly.)"""
    import datetime as dt

    import pytest
    from pyspark.sql.types import DayTimeIntervalType, IntegerType

    from informixcdc_spark.cdc.binary import decode_row_image, encode_row_image
    from informixcdc_spark.cdc.typemap import parse_ddl, schema_from_ddl

    ddl = (
        "k int, d1 interval day(5) to fraction(3), "
        "d2 interval hour to minute, d3 interval second to fraction, "
        "y1 interval year(4) to month, y2 interval month to month, "
        "y3 interval year to year"
    )
    schema = schema_from_ddl(ddl)
    assert schema["d1"].dataType == DayTimeIntervalType(
        DayTimeIntervalType.DAY, DayTimeIntervalType.SECOND
    )
    assert schema["d2"].dataType == DayTimeIntervalType(
        DayTimeIntervalType.HOUR, DayTimeIntervalType.MINUTE
    )
    assert schema["d3"].dataType == DayTimeIntervalType(
        DayTimeIntervalType.SECOND, DayTimeIntervalType.SECOND
    )
    for ym in ("y1", "y2", "y3"):
        assert schema[ym].dataType == IntegerType()

    cols = parse_ddl(ddl)
    values = {
        "k": 1,
        "d1": dt.timedelta(days=-3, seconds=5025, microseconds=123456),
        "d2": dt.timedelta(hours=2, minutes=30),
        "d3": None,
        "y1": 18,  # 1 year 6 months
        "y2": -7,  # negative spans round-trip
        "y3": None,
    }
    assert decode_row_image(cols, encode_row_image(cols, values), 0) == values

    with pytest.raises(ValueError, match="mixes the year-month"):
        parse_ddl("bad interval year to day")
