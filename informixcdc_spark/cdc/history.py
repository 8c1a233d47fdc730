"""Row-version history (SCD Type 2) from the CDC change log.

The second classic consumer-side artifact (alongside the net-effect
table and the IVM aggregate view): every committed row image becomes a
VERSION with a validity interval in commit order, so point-in-time
queries ("the row as of commit C") and audit trails fall out of plain
filters. The reference's consumer loop sees the same IUD records
(SURVEY §3.3) and would hand-roll exactly this.

Ordering follows the engine-wide (commit_seq, seq_number) convention
(see ``cdc/apply.py``): a version opens at its event's commit position
and closes at the NEXT committed event for the same key — an UPDAFT
opens a successor, a DELETE closes without opening. ``is_current``
marks versions with no successor; the current slice is by construction
identical to :func:`informixcdc_spark.cdc.apply.apply_changes` (the
property suite pins this).

A committed TRUNCATE erases its table's earlier-committed lineage —
events at or below the per-table floor are dropped before versioning,
matching ``apply_changes``'s floor semantics: history answers "versions
of rows that are part of the surviving lineage", not "every byte ever
written" (the reference's consumer, which applies TRUNCATE by clearing
its table, retains no pre-truncate history either).

Scale shape: ONE shuffle — the per-key window (hash on the key
columns). At 100 TB the window partitions by primary key, so state per
partition is bounded by versions-per-key, never table size; the
truncate floor joins broadcast (≤ 1 row per table).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from informixcdc_spark.cdc.apply import _truncate_floor, committed_events
from informixcdc_spark.cdc.model import RecordType


def history_table(
    changelog: DataFrame,
    key_cols: Sequence[str],
    last_committed_seq: int = 0,
    commits: DataFrame | None = None,
) -> DataFrame:
    """Versioned history: one row per committed INSERT/UPDAFT, with
    ``valid_from_commit_seq``/``valid_from_seq`` (the opening event's
    commit position), ``valid_to_commit_seq``/``valid_to_seq`` (the
    next committed event's position for the key; NULL while open),
    ``is_current``, and the row payload columns.

    Replay-safe: record-level duplicates collapse on ``seq_number``
    (order-sensitive — the lead window must see each event once) and
    transactions at or below ``last_committed_seq`` are discarded, same
    as :func:`apply_changes`.

    SINGLE-TABLE contract: versions are keyed on ``key_cols`` alone.
    For a multi-table log, filter per table (or wrap per-table like
    :func:`informixcdc_spark.cdc.apply.apply_changes_by_table`) first —
    two tables sharing a key value would otherwise interleave one
    version chain.
    """
    # ONE commit-set subtree feeds both the events join and the truncate
    # floor, mirroring apply_changes (guide §2.4: don't rebuild an
    # identical aggregate per consumer); ``commits`` lets a caller
    # running several consumers over one log (c05: history + compaction
    # + savepoints) supply a single shared frame
    from informixcdc_spark.cdc.apply import committed_transactions

    if commits is None:
        commits = committed_transactions(changelog, last_committed_seq)
    events = committed_events(
        changelog, last_committed_seq, dedup_records=True, commits=commits
    )

    truncs = _truncate_floor(changelog, last_committed_seq, commits=commits)
    events = (
        events.join(
            F.broadcast(truncs),
            events["tabname"] == truncs["_tr_tab"],
            "left",
        )
        .where(
            F.col("_tr_floor").isNull()
            | (F.struct("_commit_seq", "seq_number") > F.col("_tr_floor"))
        )
        .drop("_tr_tab", "_tr_floor")
    )

    flat = events.select(
        F.col("_commit_seq"), F.col("seq_number"), F.col("record_type"),
        F.col("row.*"),
    )
    w = Window.partitionBy(*[F.col(k) for k in key_cols]).orderBy(
        "_commit_seq", "seq_number"
    )
    nxt = F.lead(F.struct("_commit_seq", "seq_number")).over(w)
    versioned = flat.withColumn("_next", nxt).where(
        # DELETE closes its predecessor (via lead) but opens no version
        F.col("record_type") != RecordType.DELETE.name
    )
    payload = [
        c
        for c in flat.columns
        if c not in ("_commit_seq", "seq_number", "record_type")
    ]
    return versioned.select(
        *payload,
        F.col("_commit_seq").alias("valid_from_commit_seq"),
        F.col("seq_number").alias("valid_from_seq"),
        F.col("_next._commit_seq").alias("valid_to_commit_seq"),
        F.col("_next.seq_number").alias("valid_to_seq"),
        F.col("_next").isNull().alias("is_current"),
    )


def as_of(history: DataFrame, commit_seq: int) -> DataFrame:
    """Point-in-time slice: the rows as they stood after the commit at
    ``commit_seq`` applied — versions open at that position. A plain
    range filter over the history table; at scale this prunes on
    min/max column statistics of the validity columns."""
    pos = F.struct(
        F.lit(commit_seq).cast("long").alias("_commit_seq"),
        F.lit(1 << 62).alias("seq_number"),
    )
    opened = F.struct(
        F.col("valid_from_commit_seq").alias("_commit_seq"),
        F.col("valid_from_seq").alias("seq_number"),
    )
    closed = F.struct(
        F.col("valid_to_commit_seq").alias("_commit_seq"),
        F.col("valid_to_seq").alias("seq_number"),
    )
    return history.where(
        (opened <= pos) & (F.col("valid_to_commit_seq").isNull() | (closed > pos))
    ).drop(
        "valid_from_commit_seq",
        "valid_from_seq",
        "valid_to_commit_seq",
        "valid_to_seq",
        "is_current",
    )
