"""CDC-semantics queries, oracle-checked in closed form.

Each query derives the deterministic change log of
:mod:`informixcdc_spark.cdc.generator` from ``orders`` inside the query,
runs the real CDC machinery (transaction assembly, rollback/open-txn
exclusion, replay discard, net effect), and the DuckDB oracle states the
expected result in closed form over the same ``orders`` parquet — so a
bug anywhere in the pipeline mismatches the gate.

Generator rules recap (k = o_orderkey): rolled back iff k%10==3; still
open iff k%13==11 (and not rolled back); deleted iff k%7==0; updated
(price*1.1) iff k%5==0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from informixcdc_spark.cdc.apply import apply_changes, update_pairs
from informixcdc_spark.cdc.generator import orders_changelog
from informixcdc_spark.cdc.savepoints import open_transactions, restart_state
from informixcdc_spark.queries import register

#: orders rendered as Informix DDL for the binary round-trip (c08)
_ORDERS_DDL = (
    "o_orderkey bigint, o_custkey bigint, o_orderstatus varchar(2), "
    "o_totalprice float, o_orderdate datetime year to fraction, "
    "o_orderpriority varchar(20)"
)
_ORDERS_TABID = 101

_FINAL_STATE_ORACLE = """
    SELECT o_orderkey, o_custkey, o_orderstatus,
           CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 1.1
                ELSE o_totalprice END AS o_totalprice,
           o_orderdate, o_orderpriority
    FROM orders
    WHERE o_orderkey % 10 <> 3   -- rolled back
      AND o_orderkey % 13 <> 11  -- still open, not committed
      AND o_orderkey % 7 <> 0    -- deleted
"""


# ---------------------------------------------------------------------------
# c01 — full batch apply: inserts + update pairs + deletes + rollbacks +
# open transactions → materialized net effect (T1–T6 semantics).
# ---------------------------------------------------------------------------
@register("c01_cdc_apply_net_effect", oracle=_FINAL_STATE_ORACLE)
def c01_cdc_apply_net_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    log = orders_changelog(spark, sf_dir)
    return apply_changes(log, key_cols=["o_orderkey"])


# ---------------------------------------------------------------------------
# c02 — exactly-once under at-least-once delivery: the whole stream is
# delivered twice (restart replay); record-level dedup on seq_number plus
# the commit filter must yield the identical final state (SURVEY §2.8.1).
# ---------------------------------------------------------------------------
@register("c02_cdc_exactly_once_replay", oracle=_FINAL_STATE_ORACLE)
def c02_cdc_exactly_once_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    log = orders_changelog(spark, sf_dir)
    replayed = log.unionByName(log)  # at-least-once: every record twice
    return apply_changes(replayed, key_cols=["o_orderkey"])


# ---------------------------------------------------------------------------
# c03 — replay-discard watermark (T5): transactions whose commit seq is
# at or below the last-committed watermark must NOT re-apply. We set the
# watermark so that exactly the keys <= half the keyspace are already
# consumed, and apply on top of the base they produced — final state must
# equal c01 (idempotent restart).
# ---------------------------------------------------------------------------
@register("c03_cdc_restart_idempotent", oracle=_FINAL_STATE_ORACLE)
def c03_cdc_restart_idempotent(spark: SparkSession, sf_dir: str) -> DataFrame:
    log = orders_changelog(spark, sf_dir)
    orders = log.sparkSession.read.parquet(f"{sf_dir}/orders.parquet")
    mid = orders.agg((F.max("o_orderkey") / 2).cast("long")).collect()[0][0]
    watermark = mid * 10 + 9  # commit seq of txn `mid`
    # base: what a first run materialized up to the watermark
    first_half = log.where(F.col("transaction_id") <= mid)
    base = apply_changes(first_half, key_cols=["o_orderkey"])
    # restart: full stream replayed against the watermark
    return apply_changes(
        log, key_cols=["o_orderkey"], last_committed_seq=watermark, base=base
    )


# ---------------------------------------------------------------------------
# c04 — UPDBEF/UPDAFT pairing (SURVEY §2.8.4): reconstruct before/after
# price pairs for committed updates via per-txn ordered window.
# ---------------------------------------------------------------------------
@register(
    "c04_cdc_update_pairs",
    oracle="""
    SELECT o_orderkey,
           o_totalprice AS before_price,
           o_totalprice * 1.1 AS after_price
    FROM orders
    WHERE o_orderkey % 5 = 0 AND o_orderkey % 10 <> 3 AND o_orderkey % 13 <> 11
    """,
)
def c04_cdc_update_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = update_pairs(orders_changelog(spark, sf_dir))
    return pairs.select(
        F.col("after.o_orderkey").alias("o_orderkey"),
        F.col("before.o_totalprice").alias("before_price"),
        F.col("after.o_totalprice").alias("after_price"),
    )


# ---------------------------------------------------------------------------
# c05 — restart-state resolution (R2/R3/R4 rule table +
# opntxns/lsttxn analogs): min open-txn begin LSN and max commit LSN.
# ---------------------------------------------------------------------------
@register(
    "c05_cdc_restart_state",
    oracle="""
    SELECT CAST(COALESCE(
               MIN(CASE WHEN o_orderkey % 10 <> 3 AND o_orderkey % 13 = 11
                        THEN o_orderkey * 10 END), 0) AS BIGINT) AS restart_seq,
           CAST(COALESCE(
               MAX(CASE WHEN o_orderkey % 10 <> 3 AND o_orderkey % 13 <> 11
                        THEN o_orderkey * 10 + 9 END), 0) AS BIGINT)
               AS last_committed_seq
    FROM orders
    """,
)
def c05_cdc_restart_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    return restart_state(orders_changelog(spark, sf_dir))


# ---------------------------------------------------------------------------
# c06 — open-transaction registry (T1/T2, the opntxns table): txns with a
# BEGINTX and no terminator, with their begin LSN.
# ---------------------------------------------------------------------------
@register(
    "c06_cdc_open_transactions",
    oracle="""
    SELECT CAST(o_orderkey AS BIGINT) AS transaction_id,
           CAST(o_orderkey * 10 AS BIGINT) AS begin_seq
    FROM orders
    WHERE o_orderkey % 10 <> 3 AND o_orderkey % 13 = 11
    """,
)
def c06_cdc_open_transactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return open_transactions(orders_changelog(spark, sf_dir))


# ---------------------------------------------------------------------------
# c07 — transaction lifecycle summary: per-txn event count, bounds and
# outcome (the changelog-side aggregation view of P6–P9).
# ---------------------------------------------------------------------------
@register(
    "c07_cdc_txn_summary",
    oracle="""
    SELECT CASE WHEN o_orderkey % 10 = 3 THEN 'rolled_back'
                WHEN o_orderkey % 13 = 11 THEN 'open'
                ELSE 'committed' END AS outcome,
           COUNT(*) AS n_txns,
           CAST(SUM(2 + 1
                    + CASE WHEN o_orderkey % 5 = 0 THEN 2 ELSE 0 END
                    + CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END
                    - CASE WHEN o_orderkey % 10 <> 3 AND o_orderkey % 13 = 11
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_events
    FROM orders
    GROUP BY 1
    """,
)
def c07_cdc_txn_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    log = orders_changelog(spark, sf_dir)
    per_txn = log.groupBy("transaction_id").agg(
        F.count(F.lit(1)).alias("n_ev"),
        F.max(F.when(F.col("record_type") == "COMMTX", 1).otherwise(0)).alias("_c"),
        F.max(F.when(F.col("record_type") == "RBTX", 1).otherwise(0)).alias("_r"),
    )
    outcome = (
        F.when(F.col("_r") == 1, "rolled_back")
        .when(F.col("_c") == 0, "open")
        .otherwise("committed")
    )
    return (
        per_txn.withColumn("outcome", outcome)
        .groupBy("outcome")
        .agg(F.count(F.lit(1)).alias("n_txns"), F.sum("n_ev").cast("bigint").alias("n_events"))
    )


# ---------------------------------------------------------------------------
# c08 — binary wire-format round trip (P1–P5, P14): every order row is
# encoded as framed BEGINTX/INSERT/COMMTX binary records (distributed,
# mapInPandas), decoded back through the vectorized stream decoder, and
# applied — the final table must equal the source exactly, including
# timestamps to the microsecond. Excluded from bench (deliberately
# Python-heavy parity check).
# ---------------------------------------------------------------------------
@register(
    "c08_cdc_binary_roundtrip",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           o_orderdate, o_orderpriority
    FROM orders
    """,
    bench=False,
)
def c08_cdc_binary_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from informixcdc_spark.catalog import load_table
    from informixcdc_spark.cdc.binary import (
        decode_stream_df,
        encode_record,
        encode_row_image,
    )
    from informixcdc_spark.cdc.model import RecordType
    from informixcdc_spark.cdc.typemap import parse_ddl

    cols = parse_ddl(_ORDERS_DDL)
    orders = load_table(spark, sf_dir, "orders")

    def _encode(batches):
        for pdf in batches:
            recs = []
            for r in pdf.itertuples(index=False):
                k = int(r.o_orderkey)
                img = encode_row_image(
                    cols,
                    {
                        "o_orderkey": k,
                        "o_custkey": int(r.o_custkey),
                        "o_orderstatus": r.o_orderstatus,
                        "o_totalprice": float(r.o_totalprice),
                        "o_orderdate": r.o_orderdate,
                        "o_orderpriority": r.o_orderpriority,
                    },
                )
                recs.append(encode_record(RecordType.BEGINTX, seq=k * 10, txid=k))
                recs.append(
                    encode_record(
                        RecordType.INSERT,
                        seq=k * 10 + 1,
                        txid=k,
                        tabid=_ORDERS_TABID,
                        row_image=img,
                    )
                )
                recs.append(encode_record(RecordType.COMMTX, seq=k * 10 + 9, txid=k))
            yield pd.DataFrame({"record": recs})

    binary = orders.mapInPandas(_encode, schema="record binary")
    log = decode_stream_df(binary, {_ORDERS_TABID: cols}, _ORDERS_TABID, "orders")
    return apply_changes(log, key_cols=["o_orderkey"])


# ---------------------------------------------------------------------------
# c09 — the full Structured Streaming pipeline (S1–S6): changelog written
# to a directory, streamed with maxFilesPerTrigger-batched micro-batches
# through the exactly-once foreachBatch materializer, final target table
# must equal the closed-form oracle. Not benched (spins up a streaming
# query with checkpointing).
# ---------------------------------------------------------------------------
@register("c09_cdc_stream_materialize", oracle=_FINAL_STATE_ORACLE, bench=False)
def c09_cdc_stream_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from informixcdc_spark.streaming.pipeline import CdcEngine

    row_struct = StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_custkey", LongType()),
            StructField("o_orderstatus", StringType()),
            StructField("o_totalprice", DoubleType()),
            StructField("o_orderdate", TimestampType()),
            StructField("o_orderpriority", StringType()),
        ]
    )
    log = orders_changelog(spark, sf_dir)
    workdir = tempfile.mkdtemp(prefix="cdc_stream_")
    src = f"{workdir}/log"
    # two arrival files split mid-keyspace: transactions whose terminator
    # lands in file 2 exercise the pending-state carry across batches
    mid = log.agg((F.max("transaction_id") / 2).cast("long")).collect()[0][0]
    log.where(F.col("transaction_id") <= mid).coalesce(1).write.mode("append").parquet(src)
    log.where(F.col("transaction_id") > mid).coalesce(1).write.mode("append").parquet(src)

    eng = CdcEngine(spark)
    eng.connect(src)
    q, mat = eng.materialize(
        row_struct, ["o_orderkey"], f"{workdir}/state", f"{workdir}/ckpt"
    )
    q.awaitTermination(300)
    return mat.read_target()


# ---------------------------------------------------------------------------
# c10 — custom Python Data Source over the binary wire format (S1/S2):
# the changelog is recorded to capture files in the reference's framed
# envelope format (distributed, one file per partition — the S3 recorder
# analog), then read back through spark.read.format("cdc-binlog") and
# summarized per record type. The oracle states the envelope census in
# closed form over orders.
# ---------------------------------------------------------------------------
_ENVELOPE_CENSUS_ORACLE = """
    SELECT 'BEGINTX' AS record_type, COUNT(*) AS n,
           CAST(MIN(o_orderkey)*10 AS BIGINT) AS min_seq,
           CAST(MAX(o_orderkey)*10 AS BIGINT) AS max_seq FROM orders
    UNION ALL
    SELECT 'INSERT', COUNT(*), CAST(MIN(o_orderkey)*10+1 AS BIGINT),
           CAST(MAX(o_orderkey)*10+1 AS BIGINT) FROM orders
    UNION ALL
    SELECT 'UPDBEF', COUNT(*), CAST(MIN(o_orderkey)*10+2 AS BIGINT),
           CAST(MAX(o_orderkey)*10+2 AS BIGINT) FROM orders WHERE o_orderkey % 5 = 0
    UNION ALL
    SELECT 'UPDAFT', COUNT(*), CAST(MIN(o_orderkey)*10+3 AS BIGINT),
           CAST(MAX(o_orderkey)*10+3 AS BIGINT) FROM orders WHERE o_orderkey % 5 = 0
    UNION ALL
    SELECT 'DELETE', COUNT(*), CAST(MIN(o_orderkey)*10+4 AS BIGINT),
           CAST(MAX(o_orderkey)*10+4 AS BIGINT) FROM orders WHERE o_orderkey % 7 = 0
    UNION ALL
    SELECT 'COMMTX', COUNT(*), CAST(MIN(o_orderkey)*10+9 AS BIGINT),
           CAST(MAX(o_orderkey)*10+9 AS BIGINT) FROM orders
    WHERE o_orderkey % 10 <> 3 AND o_orderkey % 13 <> 11
    UNION ALL
    SELECT 'RBTX', COUNT(*), CAST(MIN(o_orderkey)*10+9 AS BIGINT),
           CAST(MAX(o_orderkey)*10+9 AS BIGINT) FROM orders WHERE o_orderkey % 10 = 3
"""


def _build_capture(spark: SparkSession, sf_dir: str, prefix: str) -> str:
    import tempfile

    from informixcdc_spark.cdc.typemap import parse_ddl
    from informixcdc_spark.sources.binlog import write_capture_from_changelog

    path = tempfile.mkdtemp(prefix=prefix)
    log = orders_changelog(spark, sf_dir)
    write_capture_from_changelog(log, parse_ddl(_ORDERS_DDL), _ORDERS_TABID, path)
    return path


@register("c10_binlog_source_batch", oracle=_ENVELOPE_CENSUS_ORACLE, bench=False)
def c10_binlog_source_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from informixcdc_spark.sources.binlog import register_binlog_source

    register_binlog_source(spark)
    path = _build_capture(spark, sf_dir, "c10_capture_")
    raw = spark.read.format("cdc-binlog").option("path", path).load()
    return raw.groupBy("record_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("seq_number").alias("min_seq"),
        F.max("seq_number").alias("max_seq"),
    )


# ---------------------------------------------------------------------------
# c11 — the same source as a STREAM: file-granular micro-batches through
# the Data Source API's streamReader with offset-log exactly-once, the
# envelope census accumulated in complete mode. Not benched (spins up a
# streaming query with a checkpoint).
# ---------------------------------------------------------------------------
@register("c11_binlog_source_stream", oracle=_ENVELOPE_CENSUS_ORACLE, bench=False)
def c11_binlog_source_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from informixcdc_spark.sources.binlog import register_binlog_source

    register_binlog_source(spark)
    path = _build_capture(spark, sf_dir, "c11_capture_")
    stream = spark.readStream.format("cdc-binlog").option("path", path).load()
    census = stream.groupBy("record_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("seq_number").alias("min_seq"),
        F.max("seq_number").alias("max_seq"),
    )
    ckpt = tempfile.mkdtemp(prefix="c11_ckpt_")
    q = (
        census.writeStream.format("memory")
        .queryName("c11_out")
        .outputMode("complete")
        .option("checkpointLocation", f"{ckpt}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table("c11_out")


# ---------------------------------------------------------------------------
# c12 — dynamic schema discovery from the stream itself (P11/P12): the
# capture opens with a TABSCHEM record carrying the table's DDL text; the
# pipeline builds its column registry FROM that record (the reference's
# runtime-schema mechanism, ext/_informixcdcmodule.ec:1722-1804 — there a
# CREATE TEMP TABLE + DESCRIBE round-trip, here typemap.parse_ddl), then
# runs the typed decode + apply. Final state must equal the closed form.
# ---------------------------------------------------------------------------
@register("c12_binlog_schema_discovery", oracle=_FINAL_STATE_ORACLE, bench=False)
def c12_binlog_schema_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from informixcdc_spark.cdc.binary import decode_envelope_df, encode_record
    from informixcdc_spark.cdc.model import RecordType
    from informixcdc_spark.cdc.typemap import parse_ddl
    from informixcdc_spark.sources.binlog import register_binlog_source

    register_binlog_source(spark)
    path = _build_capture(spark, sf_dir, "c12_capture_")
    # the schema announcement arrives first ('a-' sorts before 'part-')
    with open(os.path.join(path, "a-schema.bin"), "wb") as fh:
        fh.write(
            encode_record(
                RecordType.TABSCHEM, tabid=_ORDERS_TABID, cols_desc=_ORDERS_DDL
            )
        )
    raw = spark.read.format("cdc-binlog").option("path", path).load()
    # registry built from the stream's own TABSCHEM records — tiny
    # metadata (one row per table), the one legitimate driver round-trip
    schemas = raw.where(F.col("record_type") == "TABSCHEM").select(
        "tabid", "cols_desc"
    ).collect()
    registry = {int(r.tabid): parse_ddl(r.cols_desc) for r in schemas}
    log = decode_envelope_df(raw, registry, _ORDERS_TABID, "orders")
    return apply_changes(log, key_cols=["o_orderkey"])


# ---------------------------------------------------------------------------
# c13 — server-initiated DISCARD (P9, ext/_informixcdcmodule.ec:1617-1655):
# a log-wrap discard terminates the transaction WITHOUT committing it —
# its buffered events must vanish exactly like a rollback. Transactions
# k%11==7 get their COMMTX replaced by DISCARD; the final state loses
# exactly those keys relative to c01's closed form.
# ---------------------------------------------------------------------------
@register(
    "c13_cdc_discard_drops_txn",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus,
           CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 1.1
                ELSE o_totalprice END AS o_totalprice,
           o_orderdate, o_orderpriority
    FROM orders
    WHERE o_orderkey % 10 <> 3
      AND o_orderkey % 13 <> 11
      AND o_orderkey % 7 <> 0
      AND o_orderkey % 11 <> 7   -- server-discarded: never committed
    """,
)
def c13_cdc_discard_drops_txn(spark: SparkSession, sf_dir: str) -> DataFrame:
    log = orders_changelog(spark, sf_dir)
    discarded = F.when(
        (F.col("record_type") == "COMMTX") & (F.col("transaction_id") % 11 == 7),
        F.lit("DISCARD"),
    ).otherwise(F.col("record_type"))
    return apply_changes(
        log.withColumn("record_type", discarded), key_cols=["o_orderkey"]
    )


# ---------------------------------------------------------------------------
# c14 — mid-stream schema evolution (ALTER TABLE): the capture opens with
# a 5-column schema, announces a 6-column schema (ADD COLUMN
# o_orderpriority) via a second in-stream TABSCHEM, and later rows carry
# the wider row image. Epochs are anchored by stream position (the LSN
# analog the source emits), NOT seq — TABSCHEM carries no seq on the
# wire (§1.2). Rows decode with the schema in force at their position;
# old-epoch rows null-fill the added column. The reference rebuilds its
# registry from in-stream DDL the same way
# (ext/_informixcdcmodule.ec:1722-1804) but supports only one epoch.
# ---------------------------------------------------------------------------
_ORDERS_DDL_V1 = (
    "o_orderkey bigint, o_custkey bigint, o_orderstatus varchar(2), "
    "o_totalprice float, o_orderdate datetime year to fraction"
)


@register(
    "c14_schema_evolution",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus,
           CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 1.1
                ELSE o_totalprice END AS o_totalprice,
           o_orderdate,
           CASE WHEN o_orderkey <= (SELECT MAX(o_orderkey) // 2 FROM orders)
                THEN NULL ELSE o_orderpriority END AS o_orderpriority
    FROM orders
    WHERE o_orderkey % 10 <> 3
      AND o_orderkey % 13 <> 11
      AND o_orderkey % 7 <> 0
    """,
    bench=False,
)
def c14_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from informixcdc_spark.cdc.binary import (
        decode_envelope_df_evolving,
        encode_record,
    )
    from informixcdc_spark.cdc.model import RecordType
    from informixcdc_spark.cdc.typemap import parse_ddl
    from informixcdc_spark.sources.binlog import (
        register_binlog_source,
        write_capture_from_changelog,
    )

    register_binlog_source(spark)
    log = orders_changelog(spark, sf_dir)
    mid = (
        log.sparkSession.read.parquet(f"{sf_dir}/orders.parquet")
        .agg(F.expr("max(o_orderkey) div 2"))
        .collect()[0][0]
    )
    path = tempfile.mkdtemp(prefix="c14_capture_")
    # capture-file names sort as: a-schema < b-* (epoch 1) < c-schema < d-*
    write_capture_from_changelog(
        log.where(F.col("transaction_id") <= mid),
        parse_ddl(_ORDERS_DDL_V1),
        _ORDERS_TABID,
        path,
        prefix="b",
    )
    write_capture_from_changelog(
        log.where(F.col("transaction_id") > mid),
        parse_ddl(_ORDERS_DDL),
        _ORDERS_TABID,
        path,
        prefix="d",
    )
    for fname, ddl in (("a-schema.bin", _ORDERS_DDL_V1), ("c-schema.bin", _ORDERS_DDL)):
        with open(os.path.join(path, fname), "wb") as fh:
            fh.write(
                encode_record(RecordType.TABSCHEM, tabid=_ORDERS_TABID, cols_desc=ddl)
            )
    raw = spark.read.format("cdc-binlog").option("path", path).load()
    announcements = raw.where(F.col("record_type") == "TABSCHEM").select(
        "stream_pos", "cols_desc"
    ).collect()
    schema_log = [(int(r.stream_pos), parse_ddl(r.cols_desc)) for r in announcements]
    typed = decode_envelope_df_evolving(raw, schema_log, _ORDERS_TABID, "orders")
    return apply_changes(typed, key_cols=["o_orderkey"])
