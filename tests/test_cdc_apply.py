"""Unit tests for CDC apply semantics — the §2.8 correctness traps,
exercised with handcrafted interleaved streams (the scenario coverage
list in FIXTURES.md §2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from informixcdc_spark.cdc.apply import apply_changes, update_pairs
from informixcdc_spark.cdc.savepoints import (
    last_committed_seq,
    open_transactions,
    restart_state,
)

ROW = StructType(
    [StructField("id", LongType()), StructField("val", StringType())]
)
SCHEMA = StructType(
    [
        StructField("seq_number", LongType(), False),
        StructField("record_type", StringType(), False),
        StructField("transaction_id", LongType(), True),
        StructField("tabid", IntegerType(), True),
        StructField("tabname", StringType(), True),
        StructField("flags", IntegerType(), True),
        StructField("start_time", LongType(), True),
        StructField("commit_time", LongType(), True),
        StructField("user_id", IntegerType(), True),
        StructField("row", ROW, True),
    ]
)


def _log(spark, events):
    """events: (seq, type, txid, row_tuple_or_None [, tabname])"""
    rows = []
    for e in events:
        seq, rt, tx, row = e[0], e[1], e[2], e[3]
        tab = e[4] if len(e) > 4 else ("t" if row is not None or rt == "TRUNCATE" else None)
        rows.append((seq, rt, tx, 1 if tab else None, tab, 0, None, None, None, row))
    return spark.createDataFrame(rows, SCHEMA)


def _state(df):
    return {r["id"]: r["val"] for r in df.collect()}


def test_interleaved_transactions(spark):
    # txn A (1) and txn B (2) interleave by seq; both commit
    log = _log(
        spark,
        [
            (1, "BEGINTX", 1, None),
            (2, "BEGINTX", 2, None),
            (3, "INSERT", 1, (10, "a1")),
            (4, "INSERT", 2, (20, "b1")),
            (5, "UPDBEF", 1, (10, "a1")),
            (6, "UPDAFT", 1, (10, "a2")),
            (7, "COMMTX", 1, None),
            (8, "DELETE", 2, (20, "b1")),
            (9, "INSERT", 2, (21, "b2")),
            (10, "COMMTX", 2, None),
        ],
    )
    assert _state(apply_changes(log, ["id"])) == {10: "a2", 21: "b2"}


def test_rollback_drops_everything(spark):
    log = _log(
        spark,
        [
            (1, "BEGINTX", 1, None),
            (2, "INSERT", 1, (10, "a")),
            (3, "BEGINTX", 2, None),
            (4, "INSERT", 2, (20, "b")),
            (5, "UPDBEF", 2, (20, "b")),
            (6, "UPDAFT", 2, (20, "b2")),
            (7, "RBTX", 2, None),
            (8, "COMMTX", 1, None),
        ],
    )
    assert _state(apply_changes(log, ["id"])) == {10: "a"}


def test_open_txn_not_applied(spark):
    log = _log(
        spark,
        [
            (1, "BEGINTX", 1, None),
            (2, "INSERT", 1, (10, "a")),
            (3, "COMMTX", 1, None),
            (4, "BEGINTX", 2, None),
            (5, "INSERT", 2, (20, "b")),  # never terminated
        ],
    )
    assert _state(apply_changes(log, ["id"])) == {10: "a"}
    assert [r["transaction_id"] for r in open_transactions(log).collect()] == [2]
    st = restart_state(log).collect()[0]
    assert st["restart_seq"] == 4  # min open-txn begin LSN, not last+1
    assert st["last_committed_seq"] == 3


def test_restart_seq_without_open_txns(spark):
    # §2.8.2: no open txns but a previous commit → last + 1
    log = _log(
        spark,
        [
            (1, "BEGINTX", 1, None),
            (2, "INSERT", 1, (10, "a")),
            (3, "COMMTX", 1, None),
        ],
    )
    st = restart_state(log).collect()[0]
    assert st["restart_seq"] == 4
    # and the empty-stream default is 0
    empty = _log(spark, [(1, "TIMEOUT", None, None)])
    st0 = restart_state(empty).collect()[0]
    assert (st0["restart_seq"], st0["last_committed_seq"]) == (0, 0)


def test_replay_discard_watermark(spark):
    # txn 1 committed at seq 3 BEFORE the watermark (5): must not re-apply
    log = _log(
        spark,
        [
            (1, "BEGINTX", 1, None),
            (2, "INSERT", 1, (10, "stale")),
            (3, "COMMTX", 1, None),
            (6, "BEGINTX", 2, None),
            (7, "INSERT", 2, (20, "fresh")),
            (8, "COMMTX", 2, None),
        ],
    )
    assert _state(apply_changes(log, ["id"], last_committed_seq=5)) == {20: "fresh"}


def test_truncate_wipes_prior_rows(spark):
    log = _log(
        spark,
        [
            (1, "BEGINTX", 1, None),
            (2, "INSERT", 1, (10, "a")),
            (3, "INSERT", 1, (11, "b")),
            (4, "COMMTX", 1, None),
            (5, "BEGINTX", 2, None),
            (6, "TRUNCATE", 2, None, "t"),
            (7, "INSERT", 2, (12, "c")),
            (8, "COMMTX", 2, None),
        ],
    )
    assert _state(apply_changes(log, ["id"])) == {12: "c"}


def test_base_table_and_delete(spark):
    base = spark.createDataFrame([(10, "old"), (11, "keep")], ROW)
    log = _log(
        spark,
        [
            (1, "BEGINTX", 1, None),
            (2, "UPDBEF", 1, (10, "old")),
            (3, "UPDAFT", 1, (10, "new")),
            (4, "DELETE", 1, (11, "keep")),
            (5, "INSERT", 1, (12, "ins")),
            (6, "COMMTX", 1, None),
        ],
    )
    assert _state(apply_changes(log, ["id"], base=base)) == {10: "new", 12: "ins"}


def test_update_pairs_interleaved(spark):
    log = _log(
        spark,
        [
            (1, "BEGINTX", 1, None),
            (2, "BEGINTX", 2, None),
            (3, "UPDBEF", 1, (10, "a1")),
            (4, "UPDBEF", 2, (20, "b1")),
            (5, "UPDAFT", 1, (10, "a2")),
            (6, "UPDAFT", 2, (20, "b2")),
            (7, "COMMTX", 1, None),
            (8, "COMMTX", 2, None),
        ],
    )
    pairs = {
        r["before"]["id"]: (r["before"]["val"], r["after"]["val"])
        for r in update_pairs(log).collect()
    }
    assert pairs == {10: ("a1", "a2"), 20: ("b1", "b2")}


def test_commit_order_defines_visibility(spark):
    # §2.8 trap (r3 property-suite find): txn1 writes key 10 EARLY by seq
    # but commits LAST — commit-time visibility means its value wins,
    # even though txn2's write has the higher event seq
    log = _log(
        spark,
        [
            (1, "BEGINTX", 1, None),
            (2, "INSERT", 1, (10, "v_txn1")),
            (5, "BEGINTX", 2, None),
            (6, "INSERT", 2, (10, "v_txn2")),
            (8, "COMMTX", 2, None),  # txn2 commits first...
            (9, "COMMTX", 1, None),  # ...txn1 commits last → wins
        ],
    )
    assert _state(apply_changes(log, ["id"])) == {10: "v_txn1"}


def test_restart_apply_matches_batch_apply_on_conflicts(spark):
    # the r3 falsifying example: txn1 seqs 2-4, txn2 seqs 6-7 on the same
    # key; txn2 commits (8) before txn1 (9). Restart from watermark 8
    # (base = txn2's state) must equal full-batch apply.
    events = [
        (1, "BEGINTX", 1, None),
        (2, "INSERT", 1, (0, "v2")),
        (3, "UPDBEF", 1, (0, "v2")),
        (4, "UPDAFT", 1, (0, "v4")),
        (5, "BEGINTX", 2, None),
        (6, "INSERT", 2, (0, "v6")),
        (7, "UPDAFT", 2, (0, "v7")),
        (8, "COMMTX", 2, None),
        (9, "COMMTX", 1, None),
    ]
    full = _state(apply_changes(_log(spark, events), ["id"]))
    # first run applied only txn2 (committed at <= 8)
    base = apply_changes(
        _log(spark, [e for e in events if e[2] == 2]), ["id"]
    )
    replayed = _log(spark, events + events)  # at-least-once delivery
    restarted = _state(
        apply_changes(replayed, ["id"], last_committed_seq=8, base=base)
    )
    assert full == restarted == {0: "v4"}  # txn1 committed last


def test_truncate_wipes_base_when_single_table(spark):
    base = spark.createDataFrame([(10, "old"), (11, "older")], ROW)
    log = _log(
        spark,
        [
            (5, "BEGINTX", 2, None),
            (6, "TRUNCATE", 2, None, "t"),
            (7, "INSERT", 2, (12, "c")),
            (8, "COMMTX", 2, None),
        ],
    )
    # single-table materialization: base rows predate the truncate → wiped
    assert _state(
        apply_changes(log, ["id"], base=base, truncate_wipes_base=True)
    ) == {12: "c"}
    # default (multi-table logs, unknown base provenance): base immune
    assert _state(apply_changes(log, ["id"], base=base)) == {
        10: "old",
        11: "older",
        12: "c",
    }


def test_last_committed_monotonic(spark):
    # §2.8.3: watermark only advances — max over commits regardless of order
    log = _log(
        spark,
        [
            (9, "COMMTX", 3, None),
            (3, "COMMTX", 1, None),
            (6, "COMMTX", 2, None),
        ],
    )
    assert last_committed_seq(log).collect()[0][0] == 9


def test_multi_table_apply_isolates_key_spaces(spark):
    """64-table capture parity (ec:52): one interleaved stream, two
    tables sharing key VALUES — per-table applies must not collide, and
    a TRUNCATE of one table must not touch the other."""
    from informixcdc_spark.cdc.apply import apply_changes_by_table

    events = [
        (1, "BEGINTX", 1, None),
        (2, "INSERT", 1, (1, "a1"), "ta"),
        (3, "INSERT", 1, (1, "b1"), "tb"),  # same key, different table
        (4, "COMMTX", 1, None),
        (5, "BEGINTX", 2, None),
        (6, "UPDBEF", 2, (1, "a1"), "ta"),
        (7, "UPDAFT", 2, (1, "a2"), "ta"),
        (8, "TRUNCATE", 2, None, "tb"),
        (9, "INSERT", 2, (2, "b2"), "tb"),
        (10, "COMMTX", 2, None),
    ]
    out = apply_changes_by_table(
        _log(spark, events), {"ta": ["id"], "tb": ["id"]}
    )
    assert _state(out["ta"]) == {1: "a2"}
    assert _state(out["tb"]) == {2: "b2"}
