"""Binary change-record codec: envelope + typed row images.

Wire format (mirrors the reference's framing, SURVEY.md §1.1):

- envelope, 16 bytes, all big-endian int32: ``header_sz`` (=16),
  ``payload_sz``, ``packet_scheme`` (must be 66 —
  ``ext/_informixcdcmodule.ec:56,1816-1820``), ``record_number`` (tag);
- payload layouts per tag (offsets per SURVEY §1.2):
  BEGINTX  seq:i64 txid:i32 start_time:i64 user_id:i32
  COMMTX   seq:i64 txid:i32 commit_time:i64
  RBTX     seq:i64 txid:i32
  DISCARD  seq:i64 txid:i32
  TRUNCATE seq:i64 txid:i32 tabid:i32
  TABSCHEM tabid:i32 flags:i32 fix_len_sz:i32 fix_len_cols:i32
           var_len_cols:i32 cols_desc:utf8
  TIMEOUT  seq:i64
  IUD      seq:i64 txid:i32 tabid:i32 flags:i32 row-image
    (row image starts at payload offset 20 = CHANGE_HEADER_SZ,
     ``ext/_informixcdcmodule.ec:63``)
- row image: first a side-channel array of 4-byte BE lengths, one per
  var-length column in table order (``ext/_informixcdcmodule.ec:
  1183-1184``; 0xFFFFFFFF = NULL), then column data in table order —
  fixed types advance by ``col_size``, var types by their decoded length
  (VARCHAR skips a 1-byte prefix, LVARCHAR a 3-byte prefix —
  ``ext/_informixcdcmodule.ec:447-448,915-954``).

Scalar encodings follow SURVEY §1.4: big-endian integers, INT8 as
2-byte sign plus 32-bit lo/hi halves, DATE as julian days since
1899-12-31 (``rjulmdy`` semantics), CHAR fixed-width and NOT trimmed,
BOOL as null-flag byte + value byte. DECIMAL and DATETIME get real
encodings of our own design (flag + scale + 128-bit unscaled BE int;
flag + 64-bit epoch-micros) — the reference stubs both types to the
string "0.0" (dead code below an early break, ``ext/_informixcdcmodule
.ec:18-22,1024-1126``), a bug we deliberately do not reproduce.

NULL sentinels (reference uses ESQL ``risnull``; ours are explicit and
documented): INT/SMALLINT/BIGINT/DATE use their type's minimum value,
INT8 a sign byte of 2, floats a fixed quiet-NaN bit pattern, CHAR a
leading NUL byte, var-length columns 0xFFFFFFFF in the length array,
BOOL/DECIMAL/DATETIME a flag byte of 1.

The decoder runs as ``mapInPandas`` (Arrow-batched; binary frame walks
are genuinely inexpressible as column expressions — SURVEY §4.1's one
custom physical piece). The encoder is plain Python, used to build test
fixtures and golden streams (the analog of the reference's OWRITESBLOB
recorder, ``ext/_informixcdcmodule.ec:201-217``).
"""

from __future__ import annotations

import datetime as dt
import struct
from collections.abc import Iterable, Iterator
from decimal import Decimal, localcontext

import pandas as pd

from informixcdc_spark.cdc.model import (
    CHANGE_HEADER_SZ,
    ENVELOPE_SZ,
    PACKET_SCHEME,
    RECORD_NAMES,
    RecordType,
)
from informixcdc_spark.cdc.typemap import WireColumn

_EPOCH_DATE = dt.date(1899, 12, 31)  # Informix julian day 0
_NULL_F64 = b"\x7f\xf8\x00\x00\xde\xad\xbe\xef"
_NULL_F32 = b"\x7f\xc0\xde\xad"
_NULL_VARLEN = 0xFFFFFFFF
_I32_MIN = -(1 << 31)
_I16_MIN = -(1 << 15)
_I64_MIN = -(1 << 63)


# ---------------------------------------------------------------------------
# scalar encode / decode
# ---------------------------------------------------------------------------
def _encode_scalar(col: WireColumn, v) -> bytes:
    t = col.ifx_type
    if t in ("int8", "serial8"):
        if v is None:
            return struct.pack(">HII", 2, 0, 0)
        sign = 1 if v < 0 else 0
        mag = -v if v < 0 else v
        return struct.pack(">HII", sign, mag & 0xFFFFFFFF, mag >> 32)
    if t in ("int", "integer", "serial"):
        return struct.pack(">i", _I32_MIN if v is None else int(v))
    if t == "bigint":
        return struct.pack(">q", _I64_MIN if v is None else int(v))
    if t == "smallint":
        return struct.pack(">h", _I16_MIN if v is None else int(v))
    if t in ("float", "double precision"):
        return _NULL_F64 if v is None else struct.pack(">d", float(v))
    if t in ("smallfloat", "real"):
        return _NULL_F32 if v is None else struct.pack(">f", float(v))
    if t == "date":
        days = _I32_MIN if v is None else (v - _EPOCH_DATE).days
        return struct.pack(">i", days)
    if t == "boolean":
        return struct.pack(">BB", 1 if v is None else 0, 1 if v else 0)
    if t == "char":
        if v is None:
            return b"\x00" * col.col_size
        raw = str(v).encode("utf-8")[: col.col_size]
        return raw.ljust(col.col_size, b" ")  # pad, never trim (ec:905)
    if t in ("decimal", "money"):
        if v is None:
            return struct.pack(">B", 1) + b"\x00" * 17
        with localcontext() as ctx:
            ctx.prec = 50  # a decimal(32,16) needs more than the default 28
            d = Decimal(v).scaleb(col.scale).to_integral_value()
        return (
            struct.pack(">BB", 0, col.scale)
            + int(d).to_bytes(16, "big", signed=True)
        )
    if t == "datetime":
        if v is None:
            return struct.pack(">B", 1) + b"\x00" * 8
        # integer arithmetic: float .timestamp() loses sub-µs precision
        td = v.replace(tzinfo=None) - dt.datetime(1970, 1, 1)
        micros = (td.days * 86400 + td.seconds) * 1_000_000 + td.microseconds
        return struct.pack(">Bq", 0, micros)
    if t == "interval":
        # day-time interval span: null flag + signed BE micros — the
        # DATETIME layout minus the epoch anchor. The reference's
        # INTERVAL decode is the same dead "0.0" stub as DATETIME
        # (ext/_informixcdcmodule.ec:1073-1126); we decode correctly.
        if v is None:
            return struct.pack(">B", 1) + b"\x00" * 8
        micros = (v.days * 86400 + v.seconds) * 1_000_000 + v.microseconds
        return struct.pack(">Bq", 0, micros)
    if t == "interval_ym":
        # year-month interval span: null flag + signed BE month count
        # (years fold in as 12 months each; see typemap.parse_ddl for
        # why the decoded representation is the month INT).
        if v is None:
            return struct.pack(">B", 1) + b"\x00" * 4
        return struct.pack(">Bi", 0, v)
    raise ValueError(f"no encoder for {t!r}")


def _decode_scalar(col: WireColumn, buf: bytes, off: int):
    t = col.ifx_type
    if t in ("int8", "serial8"):
        sign, lo, hi = struct.unpack_from(">HII", buf, off)
        if sign == 2:
            return None
        mag = (hi << 32) | lo
        return -mag if sign == 1 else mag
    if t in ("int", "integer", "serial"):
        v = struct.unpack_from(">i", buf, off)[0]
        return None if v == _I32_MIN else v
    if t == "bigint":
        v = struct.unpack_from(">q", buf, off)[0]
        return None if v == _I64_MIN else v
    if t == "smallint":
        v = struct.unpack_from(">h", buf, off)[0]
        return None if v == _I16_MIN else v
    if t in ("float", "double precision"):
        raw = buf[off : off + 8]
        return None if raw == _NULL_F64 else struct.unpack(">d", raw)[0]
    if t in ("smallfloat", "real"):
        raw = buf[off : off + 4]
        return None if raw == _NULL_F32 else struct.unpack(">f", raw)[0]
    if t == "date":
        v = struct.unpack_from(">i", buf, off)[0]
        return None if v == _I32_MIN else _EPOCH_DATE + dt.timedelta(days=v)
    if t == "boolean":
        nul, val = struct.unpack_from(">BB", buf, off)
        return None if nul else bool(val)
    if t == "char":
        raw = buf[off : off + col.col_size]
        return None if raw[:1] == b"\x00" else raw.decode("utf-8")
    if t in ("decimal", "money"):
        if buf[off] == 1:
            return None
        scale = buf[off + 1]
        unscaled = int.from_bytes(buf[off + 2 : off + 18], "big", signed=True)
        with localcontext() as ctx:
            ctx.prec = 50
            return Decimal(unscaled).scaleb(-scale)
    if t == "datetime":
        if buf[off] == 1:
            return None
        micros = struct.unpack_from(">q", buf, off + 1)[0]
        return dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=micros)
    if t == "interval":
        if buf[off] == 1:
            return None
        micros = struct.unpack_from(">q", buf, off + 1)[0]
        return dt.timedelta(microseconds=micros)
    if t == "interval_ym":
        if buf[off] == 1:
            return None
        return struct.unpack_from(">i", buf, off + 1)[0]
    raise ValueError(f"no decoder for {t!r}")


# ---------------------------------------------------------------------------
# row image
# ---------------------------------------------------------------------------
def encode_row_image(cols: list[WireColumn], values: dict) -> bytes:
    varlens, data = [], []
    for c in cols:
        v = values.get(c.name)
        if c.varlen:
            if v is None:
                varlens.append(_NULL_VARLEN)
            else:
                raw = str(v).encode("utf-8")
                prefix = 3 if c.ifx_type == "lvarchar" else 1
                varlens.append(prefix + len(raw))
                data.append(b"\x00" * prefix + raw)
        else:
            data.append(_encode_scalar(c, v))
    return b"".join(struct.pack(">I", n) for n in varlens) + b"".join(data)


def decode_row_image(cols: list[WireColumn], buf: bytes, off: int) -> dict:
    n_var = sum(1 for c in cols if c.varlen)
    lengths = struct.unpack_from(f">{n_var}I", buf, off) if n_var else ()
    pos = off + 4 * n_var
    out, vi = {}, 0
    for c in cols:
        if c.varlen:
            ln = lengths[vi]
            vi += 1
            if ln == _NULL_VARLEN:
                out[c.name] = None
            else:
                prefix = 3 if c.ifx_type == "lvarchar" else 1
                out[c.name] = buf[pos + prefix : pos + ln].decode("utf-8")
                pos += ln
        else:
            out[c.name] = _decode_scalar(c, buf, pos)
            pos += c.col_size
    return out


# ---------------------------------------------------------------------------
# records
# ---------------------------------------------------------------------------
def _frame(tag: int, payload: bytes) -> bytes:
    return struct.pack(">iiii", ENVELOPE_SZ, len(payload), PACKET_SCHEME, tag) + payload


def encode_record(
    rtype: RecordType,
    seq: int = 0,
    txid: int = 0,
    tabid: int = 0,
    flags: int = 0,
    start_time: int = 0,
    commit_time: int = 0,
    user_id: int = 0,
    cols_desc: str = "",
    row_image: bytes = b"",
) -> bytes:
    t = rtype
    if t in (RecordType.INSERT, RecordType.DELETE, RecordType.UPDBEF, RecordType.UPDAFT):
        payload = struct.pack(">qiii", seq, txid, tabid, flags) + row_image
        assert len(payload) - len(row_image) == CHANGE_HEADER_SZ
    elif t == RecordType.BEGINTX:
        payload = struct.pack(">qiqi", seq, txid, start_time, user_id)
    elif t == RecordType.COMMTX:
        payload = struct.pack(">qiq", seq, txid, commit_time)
    elif t in (RecordType.RBTX, RecordType.DISCARD):
        payload = struct.pack(">qi", seq, txid)
    elif t == RecordType.TRUNCATE:
        payload = struct.pack(">qii", seq, txid, tabid)
    elif t == RecordType.TABSCHEM:
        raw = cols_desc.encode("utf-8")
        payload = struct.pack(">iiiii", tabid, flags, 0, 0, 0) + raw
    elif t == RecordType.TIMEOUT:
        payload = struct.pack(">q", seq)
    elif t == RecordType.ERROR:
        payload = b""
    else:
        raise ValueError(f"unknown record type {t}")
    return _frame(t.value, payload)


def split_stream(buf: bytes, strict: bool = False) -> Iterator[bytes]:
    """Frame a raw byte stream into records (the fetchone frame check,
    ``ext/_informixcdcmodule.ec:2245-2254``).

    A trailing PARTIAL record (a chunked transport cutting mid-record —
    fewer than 16 envelope bytes, or a frame longer than the remaining
    buffer) is NOT yielded: emitting a truncated frame would decode
    garbage downstream. Callers that stitch chunks retry the remainder
    with the next chunk appended; callers framing a COMPLETE unit (a
    whole capture file) pass ``strict=True`` so a torn tail fails
    loudly instead of silently losing the final record."""
    pos = 0
    while pos + ENVELOPE_SZ <= len(buf):
        header_sz, payload_sz, scheme, _tag = struct.unpack_from(">iiii", buf, pos)
        if scheme != PACKET_SCHEME:
            raise ValueError(f"bad packet scheme {scheme} at offset {pos}")
        sz = header_sz + payload_sz
        if pos + sz > len(buf):
            break  # incomplete trailing frame
        yield buf[pos : pos + sz]
        pos += sz
    if strict and pos != len(buf):
        raise ValueError(
            f"truncated trailing frame: {len(buf) - pos} leftover bytes "
            f"after offset {pos}"
        )


def decode_record(
    rec: bytes,
    registry: dict[int, list[WireColumn]] | None = None,
    last_seq_number: int = 0,
) -> dict:
    """One framed record → generic dict (the per-tag extractors P3–P13).

    ``last_seq_number`` is the session's last-committed LSN resolved at
    activate time (0 before any commit, matching the reference's init —
    ``ext/_informixcdcmodule.ec:300``). BEGINTX records gain a
    ``discard_candidate`` flag and COMMTX/RBTX a ``discard_transaction``
    flag, both ``seq_number < last_seq_number`` — the per-record replay
    markers the reference computes in its extractors
    (``ext/_informixcdcmodule.ec:1459-1461,1527-1529,1585-1587``)."""
    header_sz, _payload_sz, scheme, tag = struct.unpack_from(">iiii", rec, 0)
    if scheme != PACKET_SCHEME:
        raise ValueError(f"bad packet scheme {scheme}")
    p = ENVELOPE_SZ
    out: dict = {"record_type": RECORD_NAMES.get(tag, "ERROR")}
    t = RecordType(tag)
    if t in (RecordType.INSERT, RecordType.DELETE, RecordType.UPDBEF, RecordType.UPDAFT):
        seq, txid, tabid, flags = struct.unpack_from(">qiii", rec, p)
        out.update(seq_number=seq, transaction_id=txid, tabid=tabid, flags=flags)
        if registry and tabid in registry:
            out["row"] = decode_row_image(registry[tabid], rec, p + CHANGE_HEADER_SZ)
    elif t == RecordType.BEGINTX:
        seq, txid, st, uid = struct.unpack_from(">qiqi", rec, p)
        out.update(
            seq_number=seq,
            transaction_id=txid,
            start_time=st,
            user_id=uid,
            discard_candidate=seq < last_seq_number,
        )
    elif t == RecordType.COMMTX:
        seq, txid, ct = struct.unpack_from(">qiq", rec, p)
        out.update(
            seq_number=seq,
            transaction_id=txid,
            commit_time=ct,
            discard_transaction=seq < last_seq_number,
        )
    elif t == RecordType.RBTX:
        seq, txid = struct.unpack_from(">qi", rec, p)
        out.update(
            seq_number=seq,
            transaction_id=txid,
            discard_transaction=seq < last_seq_number,
        )
    elif t == RecordType.DISCARD:
        seq, txid = struct.unpack_from(">qi", rec, p)
        out.update(seq_number=seq, transaction_id=txid)
    elif t == RecordType.TRUNCATE:
        seq, txid, tabid = struct.unpack_from(">qii", rec, p)
        out.update(seq_number=seq, transaction_id=txid, tabid=tabid)
    elif t == RecordType.TABSCHEM:
        tabid, flags, fls, flc, vlc = struct.unpack_from(">iiiii", rec, p)
        out.update(
            tabid=tabid,
            flags=flags,
            cols_desc=rec[p + 20 :].decode("utf-8"),
        )
    elif t == RecordType.TIMEOUT:
        out["seq_number"] = struct.unpack_from(">q", rec, p)[0]
    return out


# ---------------------------------------------------------------------------
# vectorized Spark decode
# ---------------------------------------------------------------------------
def decode_stream_df(
    records_df,
    registry: dict[int, list[WireColumn]],
    table_tabid: int,
    tabname: str,
    last_seq_number: int = 0,
):
    """Binary records DataFrame (column ``record: binary``) → typed
    changelog DataFrame for one captured table.

    Arrow-batched ``mapInPandas``: each executor partition walks its
    records with the scalar decoders — the only Python hot path in the
    engine, and batch-vectorized at the transfer layer. Control records
    pass through with a NULL row struct.

    ``last_seq_number`` (the session watermark resolved at activate
    time) flows into :func:`decode_record`, so BEGINTX/COMMTX/RBTX rows
    carry the reference's per-record ``discard_candidate`` /
    ``discard_transaction`` replay markers. With the default 0, the
    flags are False on those records (nothing is a replay), matching the
    reference's fresh-session init; consumers that resolve the watermark
    only after decoding can instead stamp an already-decoded changelog
    with :func:`informixcdc_spark.cdc.apply.with_discard_flags`.
    """
    from informixcdc_spark.cdc.model import changelog_schema
    from informixcdc_spark.cdc.typemap import to_struct

    row_struct = to_struct(registry[table_tabid])
    out_schema = changelog_schema(row_struct)
    cols = registry[table_tabid]
    field_names = [f.name for f in out_schema.fields]

    def _decode(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf["record"]:
                d = decode_record(bytes(rec), {table_tabid: cols}, last_seq_number)
                if d.get("tabid") not in (None, table_tabid):
                    continue  # another table's events
                rows.append(
                    {
                        "seq_number": d.get("seq_number", 0),
                        "record_type": d["record_type"],
                        "transaction_id": d.get("transaction_id"),
                        "tabid": d.get("tabid"),
                        "tabname": tabname if d.get("tabid") == table_tabid else None,
                        "flags": d.get("flags"),
                        "start_time": d.get("start_time"),
                        "commit_time": d.get("commit_time"),
                        "user_id": d.get("user_id"),
                        "discard_candidate": d.get("discard_candidate"),
                        "discard_transaction": d.get("discard_transaction"),
                        "row": d.get("row"),
                    }
                )
            yield pd.DataFrame(rows, columns=field_names)

    return records_df.mapInPandas(_decode, schema=out_schema)


def _replay_flags(record_type: str, seq: int, last_seq_number: int):
    """(discard_candidate, discard_transaction) for one record — the
    reference's per-record replay markers (strict ``seq <`` comparison,
    ext/_informixcdcmodule.ec:1459-1461,1527-1529,1585-1587)."""
    before = seq < last_seq_number
    cand = before if record_type == "BEGINTX" else None
    txn = before if record_type in ("COMMTX", "RBTX") else None
    return cand, txn


def decode_envelope_df(
    envelope_df,
    registry: dict[int, list[WireColumn]],
    table_tabid: int,
    tabname: str,
    last_seq_number: int = 0,
):
    """Envelope-decoded source rows (the ``cdc-binlog`` data source's
    output, with raw ``row_image`` bytes) → typed changelog DataFrame for
    one captured table. The second half of the P1–P5 split: the source
    parses envelopes; this stage applies the per-table row codec that a
    TABSCHEM record announced (SURVEY §1.3 — the reference rebuilds its
    column registry from DDL text the server sends in-stream).
    ``last_seq_number`` stamps the per-record replay markers, as in
    :func:`decode_stream_df`."""
    from informixcdc_spark.cdc.model import changelog_schema
    from informixcdc_spark.cdc.typemap import to_struct

    cols = registry[table_tabid]
    out_schema = changelog_schema(to_struct(cols))
    field_names = [f.name for f in out_schema.fields]
    iud = {"INSERT", "DELETE", "UPDBEF", "UPDAFT"}

    def _decode(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.record_type == "TABSCHEM" or (
                    r.tabid is not None
                    and not pd.isna(r.tabid)
                    and int(r.tabid) != table_tabid
                ):
                    continue  # schema announcements / other tables' events
                is_iud = r.record_type in iud
                cand, txn = _replay_flags(
                    r.record_type, int(r.seq_number), last_seq_number
                )
                rows.append(
                    {
                        "seq_number": int(r.seq_number),
                        "record_type": r.record_type,
                        "transaction_id": r.transaction_id,
                        "tabid": int(r.tabid) if is_iud else None,
                        "tabname": tabname if is_iud else None,
                        "flags": int(r.flags) if is_iud else None,
                        "start_time": r.start_time,
                        "commit_time": r.commit_time,
                        "user_id": r.user_id,
                        "discard_candidate": cand,
                        "discard_transaction": txn,
                        "row": decode_row_image(cols, bytes(r.row_image), 0)
                        if is_iud
                        else None,
                    }
                )
            yield pd.DataFrame(rows, columns=field_names)

    return envelope_df.mapInPandas(_decode, schema=out_schema)


def decode_envelope_df_evolving(
    envelope_df,
    schema_log: list[tuple[int, list[WireColumn]]],
    table_tabid: int,
    tabname: str,
    last_seq_number: int = 0,
):
    """Schema-evolution variant of :func:`decode_envelope_df`: rows decode
    with the schema IN FORCE at their stream position.
    ``last_seq_number`` stamps the per-record replay markers, as in
    :func:`decode_stream_df`.

    ``schema_log`` is [(stream_pos, cols), ...] from the capture's own
    TABSCHEM records (ALTER TABLE re-announces the schema mid-stream —
    the reference rebuilds its registry the same way, SURVEY §1.3), or
    from a persisted :class:`informixcdc_spark.cdc.registry.EpochRegistry`
    when resuming a stream past already-consumed announcements. It is
    tiny (one entry per DDL change), so it broadcasts inside the UDF
    closure; the decode itself stays a distributed Arrow-batched map.

    Output struct = the LATEST schema, and every supported DDL
    transition projects onto it: column ADD (older-epoch rows null-fill
    the new column), column DROP (older-epoch values for a column absent
    from the latest schema vanish from the projection), and re-TYPE
    WIDENING such as int→bigint (each row image decodes with its own
    epoch's wire type, the value surfaces as the latest logical type; a
    narrowing re-TYPE fails loudly at the Arrow boundary rather than
    silently truncating).
    """
    import bisect

    from informixcdc_spark.cdc.model import changelog_schema
    from informixcdc_spark.cdc.typemap import to_struct

    epochs = sorted(schema_log, key=lambda e: e[0])
    if not epochs:
        raise ValueError("schema_log is empty — no TABSCHEM for table")
    positions = [pos for pos, _ in epochs]
    latest = epochs[-1][1]
    latest_names = [c.name for c in latest]
    out_schema = changelog_schema(to_struct(latest))
    field_names = [f.name for f in out_schema.fields]
    iud = {"INSERT", "DELETE", "UPDBEF", "UPDAFT"}

    def _cols_at(pos: int) -> list[WireColumn]:
        i = bisect.bisect_right(positions, pos) - 1
        if i < 0:
            raise ValueError(f"record at stream_pos={pos} precedes first TABSCHEM")
        return epochs[i][1]

    def _decode(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.record_type == "TABSCHEM" or (
                    r.tabid is not None
                    and not pd.isna(r.tabid)
                    and int(r.tabid) != table_tabid
                ):
                    continue
                is_iud = r.record_type in iud
                if is_iud:
                    decoded = decode_row_image(
                        _cols_at(int(r.stream_pos)), bytes(r.row_image), 0
                    )
                    row = {n: decoded.get(n) for n in latest_names}
                else:
                    row = None
                cand, txn = _replay_flags(
                    r.record_type, int(r.seq_number), last_seq_number
                )
                rows.append(
                    {
                        "seq_number": int(r.seq_number),
                        "record_type": r.record_type,
                        "transaction_id": r.transaction_id,
                        "tabid": int(r.tabid) if is_iud else None,
                        "tabname": tabname if is_iud else None,
                        "flags": int(r.flags) if is_iud else None,
                        "start_time": r.start_time,
                        "commit_time": r.commit_time,
                        "user_id": r.user_id,
                        "discard_candidate": cand,
                        "discard_transaction": txn,
                        "row": row,
                    }
                )
            yield pd.DataFrame(rows, columns=field_names)

    return envelope_df.mapInPandas(_decode, schema=out_schema)
