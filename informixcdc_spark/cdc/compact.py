"""Changelog compaction: fold a committed prefix into a snapshot + tail.

A CDC log grows without bound; every consumer artifact in this engine
(net-effect apply, IVM views, SCD2 history) reads it from some restart
point. Compaction rewrites the log as

- ``snapshot``: the materialized net effect of every transaction
  committed at or before the chosen watermark (O(live keys) rows), and
- ``tail``: the raw events of transactions NOT settled by the watermark
  — committed after it, or still open (their begin LSN is exactly the
  reference's min-open-LSN replay window, ``ext/_informixcdcmodule.ec:
  2181-2194``: a compactor must never drop an open transaction's
  events). Rolled-back and replay-discarded transactions are dropped
  entirely.

Contract (property-tested): for any log and any commit watermark W,
``apply_changes(tail, base=snapshot, last_committed_seq=W,
truncate_wipes_base=True)`` equals ``apply_changes(full_log)`` — so a
consumer can atomically swap {snapshot, tail, W} in for the original
log and keep identical semantics, including against events appended
later (append-only suffixes join the tail unchanged).

Scale shape: one apply (snapshot) + one anti-join on the settled-txn
set (tail filter). Storage drops from O(all events ever) to
O(live keys) + O(unsettled events) — the same bound the streaming
materializer maintains incrementally (pending/ + target/).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from informixcdc_spark.cdc.apply import apply_changes
from informixcdc_spark.cdc.model import RecordType


def compact_changelog(
    changelog: DataFrame,
    key_cols: Sequence[str],
    up_to_seq: int,
    last_committed_seq: int = 0,
    base: DataFrame | None = None,
    commits: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Returns ``(snapshot, tail)`` for the watermark ``up_to_seq``.

    ``last_committed_seq`` and ``base`` carry an earlier compaction's
    watermark and snapshot, so compaction COMPOSES: compacting a
    compacted tail on top of its snapshot at a later watermark yields
    the same contract ({snap2, tail2, W2} replaces {snap1, tail1, W1}).

    ``commits`` optionally supplies
    :func:`informixcdc_spark.cdc.apply.committed_transactions` of this
    ``changelog`` at ``last_committed_seq``, precomputed by a caller
    that also feeds it to other consumers (one deduped commit-set
    exchange serves them all, guide §2.4).

    SINGLE-TABLE contract: the snapshot folds on ``key_cols`` alone —
    a multi-table log must be filtered (or wrapped per table like
    :func:`informixcdc_spark.cdc.apply.apply_changes_by_table`) first,
    or key-value collisions across tables fold into one snapshot row.
    """
    from informixcdc_spark.cdc.apply import committed_transactions

    # apply_changes admits ALL commits past last_committed_seq; restrict
    # the fold to the watermark by keeping only transactions whose
    # commit lands in (last_committed_seq, up_to_seq]: a txn committing
    # after up_to_seq must NOT fold into the snapshot. The settled set
    # is the admitted commit set FILTERED at the watermark — one
    # deduped frame serves the settled filter, the prefix apply's
    # events join and its truncate floor (guide §2.4). Equivalent to
    # filtering before the dedup because a transaction commits ONCE:
    # at-least-once replays duplicate the COMMTX record verbatim (same
    # seq_number) — the engine-wide assumption committed_transactions'
    # arbitrary-row dropDuplicates already bakes into every consumer.
    if commits is None:
        commits = committed_transactions(changelog, last_committed_seq)
    settled_commits = commits.where(F.col("_commit_seq") <= F.lit(up_to_seq))
    prefix = changelog.join(
        settled_commits,
        changelog["transaction_id"] == settled_commits["_ct_txid"],
        "left_semi",
    )
    # the prefix's own commit set IS settled_commits (the semi-join
    # keeps exactly the settled txns' records, and each txn's single
    # commit lands in (last_committed_seq, up_to_seq]) — pass it down
    # so the apply never rebuilds the aggregate
    snapshot = apply_changes(
        prefix,
        key_cols,
        last_committed_seq=last_committed_seq,
        base=base,
        truncate_wipes_base=True,
        commits=settled_commits,
    )

    # tail: events of txns neither settled (committed <= W) nor aborted.
    # An RBTX at ANY position settles the txn as dropped — apply ignores
    # rolled-back txns wherever they terminate, so their events never
    # need replaying.
    gone = (
        changelog.where(
            (
                (F.col("record_type") == RecordType.COMMTX.name)
                & (F.col("seq_number") <= F.lit(up_to_seq))
            )
            | F.col("record_type").isin(
                RecordType.RBTX.name, RecordType.DISCARD.name
            )
        )
        .select(F.col("transaction_id").alias("_g_txid"))
        .dropDuplicates(["_g_txid"])
    )
    tail = changelog.join(
        gone, changelog["transaction_id"] == gone["_g_txid"], "left_anti"
    )
    return snapshot, tail
