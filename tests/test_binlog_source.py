"""Binary capture data source: wire fidelity, partitioning, exactly-once
streaming restart (the S1/S2 source surface of SURVEY §2.1)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from informixcdc_spark.cdc.generator import orders_changelog
from informixcdc_spark.cdc.typemap import parse_ddl
from informixcdc_spark.queries.cdcq import _ORDERS_DDL, _ORDERS_TABID
from informixcdc_spark.sources.binlog import (
    register_binlog_source,
    write_capture_from_changelog,
)


def _capture(spark, tmp_path, name="cap"):
    path = str(tmp_path / name)
    log = orders_changelog(spark, "/root/testdata/sf0.001")
    n = write_capture_from_changelog(
        log, parse_ddl(_ORDERS_DDL), _ORDERS_TABID, path
    )
    return path, log, n


def test_batch_read_roundtrips_envelope(spark, tmp_path):
    path, log, n_written = _capture(spark, tmp_path)
    register_binlog_source(spark)
    got = spark.read.format("cdc-binlog").option("path", path).load()
    assert got.count() == n_written == log.count()
    # every record's envelope fields survive the wire round trip
    want = log.select("seq_number", "record_type", "transaction_id").sort("seq_number")
    have = got.select("seq_number", "record_type", "transaction_id").sort("seq_number")
    assert want.collect() == have.collect()


def test_batch_read_parallelizes_by_file(spark, tmp_path):
    path, _, _ = _capture(spark, tmp_path)
    n_files = len([f for f in os.listdir(path) if f.endswith(".bin")])
    assert n_files > 1  # the recorder wrote one file per partition
    register_binlog_source(spark)
    got = spark.read.format("cdc-binlog").option("path", path).load()
    assert got.rdd.getNumPartitions() == n_files


def test_iud_records_carry_row_image(spark, tmp_path):
    path, _, _ = _capture(spark, tmp_path)
    register_binlog_source(spark)
    got = spark.read.format("cdc-binlog").option("path", path).load()
    iud = got.where(F.col("record_type").isin("INSERT", "DELETE", "UPDBEF", "UPDAFT"))
    assert iud.where(F.col("row_image").isNull()).count() == 0
    ctl = got.where(F.col("record_type").isin("BEGINTX", "COMMTX", "RBTX"))
    assert ctl.where(F.col("row_image").isNotNull()).count() == 0


def test_stream_restart_is_exactly_once(spark, tmp_path):
    """Files arriving across a checkpoint restart are each delivered
    exactly once — the R2–R4 resume semantics at the source layer."""
    path, log, total = _capture(spark, tmp_path)
    register_binlog_source(spark)
    files = sorted(f for f in os.listdir(path) if f.endswith(".bin"))
    assert len(files) >= 2
    # hide the tail files, stream the head, then restore and resume
    hidden = str(tmp_path / "hidden")
    os.makedirs(hidden)
    for f in files[1:]:
        os.rename(os.path.join(path, f), os.path.join(hidden, f))
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = spark.readStream.format("cdc-binlog").option("path", path).load()
        q = (
            stream.groupBy("record_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .writeStream.format("memory")
            .queryName("binlog_restart_out")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    first = spark.table("binlog_restart_out").agg(F.sum("n")).collect()[0][0]
    assert 0 < first < total
    for f in files[1:]:
        os.rename(os.path.join(hidden, f), os.path.join(path, f))
    run_once()  # resumes from the SAME checkpoint; complete-mode recount
    second = spark.table("binlog_restart_out").agg(F.sum("n")).collect()[0][0]
    assert second == total


def test_evolving_decode_requires_schema_announcement(spark, tmp_path):
    from informixcdc_spark.cdc.binary import decode_envelope_df_evolving
    import pytest as _pytest

    path, _, _ = _capture(spark, tmp_path)
    register_binlog_source(spark)
    raw = spark.read.format("cdc-binlog").option("path", path).load()
    with _pytest.raises(ValueError, match="schema_log is empty"):
        decode_envelope_df_evolving(raw, [], _ORDERS_TABID, "orders")


def test_stream_pos_totally_orders_capture(spark, tmp_path):
    # stream_pos is strictly increasing in (file order, record order) —
    # the LSN property that anchors schema epochs
    path, _, n = _capture(spark, tmp_path)
    register_binlog_source(spark)
    raw = spark.read.format("cdc-binlog").option("path", path).load()
    assert raw.select("stream_pos").distinct().count() == n


def test_materialize_through_stream_restart_mid_transaction(spark, tmp_path):
    """The c09 'binlog' arm's pytest twin: kill the availableNow run with
    a transaction still open mid-capture, resume from the same
    checkpoint, and require (a) the final table equals the batch apply of
    the full log, (b) the resumed run read ONLY the files that arrived
    after the kill — the seam between the source's offset commit and the
    materializer's pending-state carry."""
    from informixcdc_spark.cdc.apply import apply_changes
    from informixcdc_spark.cdc.binary import decode_envelope_df
    from informixcdc_spark.streaming.pipeline import Materializer

    log = orders_changelog(spark, "/root/testdata/sf0.001")
    wire = parse_ddl(_ORDERS_DDL)
    register_binlog_source(spark)
    cap = str(tmp_path / "cap")
    mid = log.agg((F.max("transaction_id") / 2).cast("long")).collect()[0][0]
    split = mid * 10 + 4  # inside txn `mid`: open across the restart
    head = log.where(F.col("seq_number") <= split)
    tail = log.where(F.col("seq_number") > split)
    write_capture_from_changelog(head, wire, _ORDERS_TABID, cap, prefix="a")

    mat = Materializer(spark, str(tmp_path / "state"), ["o_orderkey"])
    seen = []  # envelope rows per processed micro-batch

    def _apply(df, batch_id):
        df = df.localCheckpoint(eager=True)  # count + decode, one read
        seen.append(df.count())
        typed = decode_envelope_df(df, {_ORDERS_TABID: wire}, _ORDERS_TABID, "orders")
        mat.process_batch(typed, batch_id)

    def _run():
        q = (
            spark.readStream.format("cdc-binlog")
            .option("path", cap)
            .load()
            .writeStream.foreachBatch(_apply)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _run()
    n_head = sum(seen)
    assert n_head == head.count()
    # the split transaction is open: it sits in pending, not the target
    pending_tx = {
        r["transaction_id"]
        for r in mat.read_pending().select("transaction_id").distinct().collect()
    }
    assert mid in pending_tx

    write_capture_from_changelog(tail, wire, _ORDERS_TABID, cap, prefix="b")
    _run()
    # resumed run consumed exactly the tail records — nothing re-read
    assert sum(seen) - n_head == tail.count()

    want = {
        (r["o_orderkey"], r["o_totalprice"])
        for r in apply_changes(log, key_cols=["o_orderkey"]).collect()
    }
    got = {
        (r["o_orderkey"], r["o_totalprice"])
        for r in mat.read_target().collect()
    }
    assert got == want
