"""Batch application of a change log — transaction assembly + net effect.

Reproduces the semantics the reference's consumer must implement on top
of the raw event stream (the reference emits interleaved events and
tracks txn lifecycle in its savepoint tables; SURVEY.md §2.4):

- only COMMITTED transactions apply (BEGINTX..COMMTX; RBTX drops all
  events of the txn — ``ext/_informixcdcmodule.ec:2259-2319``);
- replayed transactions (commit seq <= the last-committed watermark) are
  discarded — the reference's ``discard_transaction`` flag
  (``ext/_informixcdcmodule.ec:1527-1529``), i.e. the exactly-once filter
  after at-least-once replay;
- at-least-once duplicate *records* collapse on ``seq_number`` (the
  stream's total order, ``ext/_informixcdcmodule.ec:747``);
- TRUNCATE wipes all earlier-applied rows of its table
  (``ext/_informixcdcmodule.ec:1657-1720``);
- within a key, the LAST committed event wins (net effect), where
  "last" is COMMIT order: a transaction's writes become visible
  atomically at its COMMTX (the reference's consumer buffers events and
  applies them when the commit record arrives —
  ``ext/_informixcdcmodule.ec:1527-1529,2269-2299``), so the winner
  ordering key is ``(commit_seq, seq_number)``, never raw event seq.
  Raw-seq ordering is NOT incrementally consistent: when txn A begins
  before but commits after txn B, a restart whose base already holds
  B's (higher-seq) write would let A's lower-seq replayed write win —
  the bug round 3's property suite caught. Commit-order IS consistent:
  every replayed commit_seq exceeds the watermark, which bounds every
  base row's commit position, so base-at-(-inf,-inf) stays correct.
  A trailing DELETE removes the row, a trailing UPDAFT/INSERT defines
  it. UPDBEF records carry the pre-image only
  (``ext/_informixcdcmodule.ec:74``) and never define final state.

Scale design: one shuffle to join events to commit outcomes (hash on
transaction_id — broadcastable when the commit set is small, AQE
decides), one shuffle for the per-key net-effect window (hash on the
primary key). No driver-side collection; state never materializes on one
node.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from informixcdc_spark.cdc.model import RecordType

_IUD = [RecordType.INSERT.name, RecordType.DELETE.name, RecordType.UPDAFT.name]


def with_discard_flags(changelog: DataFrame, last_committed_seq: int = 0) -> DataFrame:
    """Append the reference's per-record replay markers as columns.

    ``discard_candidate`` on BEGINTX and ``discard_transaction`` on
    COMMTX/RBTX, both ``seq_number < last_committed_seq``
    (``ext/_informixcdcmodule.ec:1459-1461,1527-1529,1585-1587``); NULL on
    every other record type. Pure column expressions — no shuffle, fuses
    into the scan.

    Boundary contract at ``seq_number == last_committed_seq``: this
    function mirrors the reference's STRICT ``<``, so the commit that
    established the watermark itself is flagged False (the reference
    treats only strictly-earlier records as replays). The composing
    predicate :func:`committed_transactions` uses ``>`` — that same
    commit is treated as already applied and dropped. The two are
    consistent by design: "flagged as replay" (strictly before) and
    "needs applying" (strictly after) deliberately both exclude the
    watermark commit, which was applied in the run that recorded it."""
    lsn = F.lit(last_committed_seq)
    before = F.col("seq_number") < lsn
    return changelog.withColumn(
        "discard_candidate",
        F.when(F.col("record_type") == RecordType.BEGINTX.name, before),
    ).withColumn(
        "discard_transaction",
        F.when(
            F.col("record_type").isin(
                RecordType.COMMTX.name, RecordType.RBTX.name
            ),
            before,
        ),
    )


def committed_transactions(changelog: DataFrame, last_committed_seq: int = 0) -> DataFrame:
    """(transaction_id, commit_seq) of txns that committed past the watermark.

    ``commit_seq > last_committed_seq`` is the replay-discard predicate
    (T5): after a restart from min(open-txn LSN) the stream re-delivers
    transactions that already materialized; they must drop exactly-once.

    Boundary contract at ``commit_seq == last_committed_seq``: the
    watermark names the LAST APPLIED commit, so that commit is dropped
    here (already applied) while :func:`with_discard_flags` — mirroring
    the reference's strict ``<`` — flags it False. See the note there.
    """
    return (
        changelog.where(F.col("record_type") == RecordType.COMMTX.name)
        .where(F.col("seq_number") > F.lit(last_committed_seq))
        .select(
            F.col("transaction_id").alias("_ct_txid"),
            F.col("seq_number").alias("_commit_seq"),
        )
        .dropDuplicates(["_ct_txid"])
    )


def committed_events(
    changelog: DataFrame,
    last_committed_seq: int = 0,
    record_types: Sequence[str] = tuple(_IUD),
    dedup_records: bool = True,
    commits: DataFrame | None = None,
) -> DataFrame:
    """IUD events of committed transactions, deduped on seq_number.

    ``dedup_records=False`` skips the dedup shuffle for consumers whose
    downstream logic already tolerates exact record duplicates (e.g. the
    net-effect window in :func:`apply_changes`, where duplicate rows of
    the same seq_number are bit-identical and any row_number tie-break
    picks an equivalent winner). Order-sensitive consumers (lag/lead
    pairing) MUST keep it on: equal seq_numbers sort arbitrarily.

    ``commits`` lets a caller that also needs the commit set elsewhere
    (e.g. the truncate floor in :func:`apply_changes`) pass ONE
    :func:`committed_transactions` DataFrame for both uses: the shared
    plan subtree guarantees the exchange is built once (AQE's runtime
    exchange reuse then dedups by identity, not by canonical-plan luck)
    and keeps the analyzed plan half the size.
    """
    if commits is None:
        commits = committed_transactions(changelog, last_committed_seq)
    events = changelog.where(F.col("record_type").isin(list(record_types)))
    joined = events.join(
        commits, events["transaction_id"] == commits["_ct_txid"], "inner"
    ).drop("_ct_txid")
    return joined.dropDuplicates(["seq_number"]) if dedup_records else joined


def _truncate_floor(
    changelog: DataFrame,
    last_committed_seq: int,
    commits: DataFrame | None = None,
) -> DataFrame:
    """Per-table max committed TRUNCATE position, as a (commit_seq,
    seq_number) struct: events at or below it are wiped. The pair ordering
    matches the net-effect winner key — an event from a txn that committed
    AFTER the truncate's txn survives even if its raw seq is lower."""
    if commits is None:
        commits = committed_transactions(changelog, last_committed_seq)
    return (
        changelog.where(F.col("record_type") == RecordType.TRUNCATE.name)
        .join(commits, F.col("transaction_id") == F.col("_ct_txid"), "inner")
        .groupBy("tabname")
        .agg(
            F.max(F.struct("_commit_seq", "seq_number")).alias("_tr_floor")
        )
        .select(F.col("tabname").alias("_tr_tab"), "_tr_floor")
    )


def apply_changes(
    changelog: DataFrame,
    key_cols: Sequence[str],
    last_committed_seq: int = 0,
    base: DataFrame | None = None,
    truncate_wipes_base: bool = False,
    commits: DataFrame | None = None,
) -> DataFrame:
    """Materialize the net effect of a change log; returns the final rows.

    ``changelog`` must have the :func:`informixcdc_spark.cdc.model.
    changelog_schema` shape with a typed ``row`` struct. ``base`` is an
    optional already-materialized table (rows behave like inserts at
    commit position (-inf, -inf) — correct because every commit this
    apply admits is past the watermark that produced ``base``). Output
    columns = the fields of ``row``.

    ``truncate_wipes_base=True`` makes a committed post-watermark
    TRUNCATE also drop ``base`` rows (base rows carry no tabname, so the
    per-table floor join can't see them). Single-table appliers — the
    streaming materializer — must set it; the default keeps base immune
    for ad-hoc multi-table logs where base provenance is unknown.

    ``commits`` optionally supplies the admitted commit set —
    (_ct_txid, _commit_seq), exactly :func:`committed_transactions` of
    this ``changelog`` at this watermark — precomputed by a caller that
    also needs it elsewhere (compaction derives its settled set and
    this apply's commit set from ONE deduped frame, guide §2.4). The
    caller owns the equivalence: passing a different commit set changes
    what applies.
    """
    # ONE commit-set subtree feeds both the events join and the truncate
    # floor (guide §2.4 — the two used to each build their own identical
    # aggregate; sharing the object makes the reuse structural)
    if commits is None:
        commits = committed_transactions(changelog, last_committed_seq)
    # the net-effect aggregation below subsumes record-level dedup:
    # replayed duplicates are bit-identical rows, so skip that shuffle
    events = committed_events(
        changelog, last_committed_seq, dedup_records=False, commits=commits
    )

    # truncate floors aggregate to <= one row per table — broadcast the
    # (usually empty) side unconditionally rather than paying a driver
    # round-trip (take(1) = one extra Spark job per apply) to skip it
    truncs = _truncate_floor(changelog, last_committed_seq, commits=commits)
    events = events.join(
        F.broadcast(truncs), events["tabname"] == truncs["_tr_tab"], "left"
    ).where(
        F.col("_tr_floor").isNull()
        | (F.struct("_commit_seq", "seq_number") > F.col("_tr_floor"))
    ).drop("_tr_tab", "_tr_floor")

    flat = events.select(
        F.col("_commit_seq"),
        F.col("seq_number"),
        F.col("record_type"),
        F.col("row.*"),
    )
    if base is not None:
        neg_inf = F.lit(-(1 << 62)).cast("long")
        base_as_inserts = base.select(
            neg_inf.alias("_commit_seq"),
            neg_inf.alias("seq_number"),
            F.lit(RecordType.INSERT.name).alias("record_type"),
            "*",
        ).select(*flat.columns)
        if truncate_wipes_base:
            # base predates every admitted commit, so ANY floor wipes it;
            # 0-or-1-row broadcast cross join, no driver round-trip
            any_floor = truncs.agg(F.max("_tr_floor").alias("_tr_floor"))
            base_as_inserts = (
                base_as_inserts.join(F.broadcast(any_floor), how="cross")
                .where(F.col("_tr_floor").isNull())
                .drop("_tr_floor")
            )
        flat = flat.unionByName(base_as_inserts)

    # net effect = the highest-(commit_seq, seq_number) event per key — a
    # hash aggregation with max_by, NOT a row_number window: the aggregate
    # partial-combines map-side, so the shuffle carries at most one row
    # per key per input partition (vs. every event) and needs no sort.
    # Commit-first ordering = commit-time visibility (see module doc);
    # ties (bit-identical replayed records) pick an equivalent winner.
    row_fields = [
        c for c in flat.columns
        if c not in ("_commit_seq", "seq_number", "record_type")
    ]
    payload = [c for c in row_fields if c not in key_cols]
    winner = flat.groupBy(*key_cols).agg(
        F.max_by(
            F.struct(F.col("record_type"), *[F.col(c) for c in payload]),
            F.struct(F.col("_commit_seq"), F.col("seq_number")),
        ).alias("_w")
    )
    return winner.where(
        F.col("_w.record_type") != RecordType.DELETE.name
    ).select(
        *[
            F.col(c) if c in key_cols else F.col(f"_w.{c}").alias(c)
            for c in row_fields
        ]
    )


def apply_changes_by_table(
    changelog: DataFrame,
    keys_by_table: dict[str, Sequence[str]],
    last_committed_seq: int = 0,
    bases: dict[str, DataFrame] | None = None,
) -> dict[str, DataFrame]:
    """Per-table net effect of a MULTI-TABLE change log.

    The reference captures up to 64 tables in one session
    (``ext/_informixcdcmodule.ec:52``) and interleaves their events in
    one stream. :func:`apply_changes` keys its winner on ``key_cols``
    alone, so two tables sharing key VALUES would collide if applied
    together — this splits the stream per table first: each table's
    sub-log keeps its own rows plus every table-less lifecycle record
    (BEGINTX/COMMTX/RBTX/DISCARD/TIMEOUT carry no tabname), so
    transaction assembly and replay discard stay correct per table.
    Returns ``{tabname: final_rows}``; each apply is independent (a
    TRUNCATE of one table never touches another — the floor join is
    per-tabname already, this adds the key-space isolation).
    """
    out = {}
    for tab, keys in keys_by_table.items():
        sub = changelog.where(
            (F.col("tabname") == tab) | F.col("tabname").isNull()
        )
        out[tab] = apply_changes(
            sub,
            keys,
            last_committed_seq=last_committed_seq,
            base=None if bases is None else bases.get(tab),
            truncate_wipes_base=bases is not None,
        )
    return out


def update_pairs(changelog: DataFrame, last_committed_seq: int = 0) -> DataFrame:
    """Reconstruct (before, after) row pairs from UPDBEF/UPDAFT records.

    The reference emits an update as two records with adjacent sequence
    numbers in the same transaction (UPDBEF then UPDAFT,
    ``ext/_informixcdcmodule.ec:74-75,1848-1856``); a consumer pairs them.
    Implemented as a per-transaction ordered window (lag) — one shuffle on
    transaction_id, no self-join.
    """
    events = committed_events(
        changelog,
        last_committed_seq,
        record_types=[RecordType.UPDBEF.name, RecordType.UPDAFT.name],
    )
    w = Window.partitionBy("transaction_id").orderBy("seq_number")
    return (
        events.withColumn("_prev_type", F.lag("record_type").over(w))
        .withColumn("_prev_row", F.lag("row").over(w))
        .where(
            (F.col("record_type") == RecordType.UPDAFT.name)
            & (F.col("_prev_type") == RecordType.UPDBEF.name)
        )
        .select(
            "transaction_id",
            F.col("seq_number").alias("updaft_seq"),
            F.col("_prev_row").alias("before"),
            F.col("row").alias("after"),
        )
    )
