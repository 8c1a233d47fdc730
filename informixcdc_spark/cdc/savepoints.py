"""Restart-state bookkeeping — the reference's two savepoint tables.

The reference maintains ``informixcdc_opntxns`` (begin LSN of every open
txn) and ``informixcdc_lsttxn`` (highest committed-and-consumed LSN) in
SQL, one synchronous DML per txn-boundary event
(``sql/informixcdc.sql:7-38``; writes ``ext/_informixcdcmodule.ec:663-771``).
We compute the same state declaratively per micro-batch / per batch, and
the streaming layer persists it with one idempotent write per batch
instead of per event (BASELINE.md calls out the per-event DML as the
anti-pattern to avoid).

Restart LSN resolution rule table (``ext/_informixcdcmodule.ec:2172-2194``):
explicit ``seq >= 0`` wins; else ``min(open-txn begin LSN)`` if any txn is
open; else ``last_committed + 1`` if a previous run committed; else 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from informixcdc_spark.cdc.model import RecordType


def open_transactions(changelog: DataFrame) -> DataFrame:
    """(transaction_id, begin_seq) of txns with no COMMTX/RBTX — the
    opntxns analog (T1/T2). Anti-join: begins minus terminators."""
    begins = changelog.where(
        F.col("record_type") == RecordType.BEGINTX.name
    ).select("transaction_id", F.col("seq_number").alias("begin_seq"))
    ended = changelog.where(
        F.col("record_type").isin([RecordType.COMMTX.name, RecordType.RBTX.name])
    ).select(F.col("transaction_id").alias("_e_txid"))
    return begins.join(
        ended, begins["transaction_id"] == ended["_e_txid"], "left_anti"
    )


def last_committed_seq(changelog: DataFrame) -> DataFrame:
    """Single-row (last_committed_seq) — the lsttxn analog (T3): running
    max of commit LSNs, floor 0 (``select nvl(...)`` at sql level,
    ``ext/_informixcdcmodule.ec:630-644``)."""
    return changelog.where(
        F.col("record_type") == RecordType.COMMTX.name
    ).agg(
        F.coalesce(F.max("seq_number"), F.lit(0)).cast("long").alias("last_committed_seq")
    )


def restart_state(
    changelog: DataFrame, open_txns: DataFrame | None = None
) -> DataFrame:
    """Single row (restart_seq, last_committed_seq) per the resolution
    rules (R2/R3/R4): restart from min open-txn begin LSN, else from
    last committed + 1, else 0.

    ``open_txns`` lets a caller that also reads the open-txn registry
    itself pass ONE :func:`open_transactions` DataFrame for both uses
    (shared plan subtree → structural exchange reuse, smaller plan)."""
    open_min = (open_txns if open_txns is not None else open_transactions(changelog)).agg(
        F.min("begin_seq").alias("_open_min")
    )
    last = last_committed_seq(changelog)
    return open_min.crossJoin(last).select(
        F.coalesce(
            F.col("_open_min"),
            F.when(F.col("last_committed_seq") > 0, F.col("last_committed_seq") + 1),
            F.lit(0),
        )
        .cast("long")
        .alias("restart_seq"),
        "last_committed_seq",
    )
