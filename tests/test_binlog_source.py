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
