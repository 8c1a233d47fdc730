"""Changelog compaction: {snapshot, tail, W} must replace the log.

Properties (derandomized, same machinery as the rest of the CDC suite):

1. for ANY interleaving, at-least-once delivery, and ANY commit
   watermark, applying the tail over the snapshot equals applying the
   full log — nothing a consumer could observe is lost by compaction;
2. the tail is genuinely compacted: no event of a settled (committed at
   or before W) or aborted transaction survives;
3. compaction COMPOSES: compacting the tail again at a later watermark
   on top of the first snapshot preserves the same contract.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from informixcdc_spark.cdc.apply import apply_changes
from informixcdc_spark.cdc.compact import compact_changelog
from tests.test_cdc_apply import _log, _state
from tests.test_property_cdc import _serial_reference, interleaved_log
from tests.conftest import examples, iterations  # noqa: E402


def _settled_or_aborted(events, w):
    settled = {tx for s, rt, tx, _ in events if rt == "COMMTX" and s <= w}
    aborted = {tx for _, rt, tx, _ in events if rt == "RBTX"}
    return settled | aborted


@settings(
    max_examples=examples(25),
    derandomize=True,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(interleaved_log(), st.data())
def test_compact_preserves_apply_and_prunes_tail(spark, events, data):
    commit_seqs = sorted(s for s, rt, _, _ in events if rt == "COMMTX")
    if not commit_seqs:
        return
    w = data.draw(st.sampled_from(commit_seqs))
    snap, tail = compact_changelog(_log(spark, events + events), ["id"], w)
    got = _state(
        apply_changes(
            tail,
            ["id"],
            last_committed_seq=w,
            base=snap,
            truncate_wipes_base=True,
        )
    )
    assert got == _serial_reference(events)

    tail_txids = {r["transaction_id"] for r in tail.select("transaction_id").distinct().collect()}
    assert tail_txids.isdisjoint(_settled_or_aborted(events, w))


@settings(
    max_examples=examples(20),
    derandomize=True,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(interleaved_log(), st.data())
def test_compaction_composes(spark, events, data):
    commit_seqs = sorted(s for s, rt, _, _ in events if rt == "COMMTX")
    if len(commit_seqs) < 2:
        return
    w1 = data.draw(st.sampled_from(commit_seqs[:-1]))
    w2 = data.draw(st.sampled_from([s for s in commit_seqs if s > w1]))
    snap1, tail1 = compact_changelog(_log(spark, events), ["id"], w1)
    snap2, tail2 = compact_changelog(
        tail1, ["id"], w2, last_committed_seq=w1, base=snap1
    )
    got = _state(
        apply_changes(
            tail2,
            ["id"],
            last_committed_seq=w2,
            base=snap2,
            truncate_wipes_base=True,
        )
    )
    assert got == _serial_reference(events)


@settings(
    max_examples=examples(15),
    derandomize=True,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(interleaved_log(), st.data())
def test_shared_commit_set_is_bit_identical(spark, events, data):
    """A precomputed `committed_transactions` frame passed via
    `commits=` (one deduped commit-set exchange serving history +
    compaction + the snapshot apply, guide §2.4) must reproduce every
    consumer row for row against the build-it-yourself default."""
    from informixcdc_spark.cdc.apply import committed_transactions
    from informixcdc_spark.cdc.history import history_table

    commit_seqs = sorted(s for s, rt, _, _ in events if rt == "COMMTX")
    if not commit_seqs:
        return
    w = data.draw(st.sampled_from(commit_seqs))
    log = _log(spark, events + events)
    commits = committed_transactions(log)

    rows = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert rows(history_table(log, ["id"], commits=commits)) == rows(
        history_table(log, ["id"])
    )
    snap_s, tail_s = compact_changelog(log, ["id"], w, commits=commits)
    snap_d, tail_d = compact_changelog(log, ["id"], w)
    assert rows(snap_s) == rows(snap_d)
    assert rows(tail_s) == rows(tail_d)


@settings(
    max_examples=examples(20),
    derandomize=True,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(interleaved_log(), st.data())
def test_compacted_log_feeds_incremental_views(spark, events, data):
    """Cross-operator composition (the deployment story): compact the
    log, bootstrap a view from the snapshot, then refresh it
    incrementally from the tail — the result must equal the view
    recomputed from the full uncompacted log, for any watermark."""
    from informixcdc_spark.cdc.ivm import (
        aggregate_view,
        finalize_view,
        incremental_aggregate_view,
    )

    commit_seqs = sorted(s for s, rt, _, _ in events if rt == "COMMTX")
    if not commit_seqs:
        return
    w = data.draw(st.sampled_from(commit_seqs))
    measures = [("n", "count", "id"), ("s", "sum", "id"), ("hi", "max", "id")]
    snap, tail = compact_changelog(_log(spark, events), ["id"], w)
    got = finalize_view(
        incremental_aggregate_view(
            aggregate_view(snap, ["val"], measures),
            tail,
            snap,
            key_cols=["id"],
            group_cols=["val"],
            measures=measures,
            last_committed_seq=w,
        ),
        measures,
    )
    full = finalize_view(
        aggregate_view(
            apply_changes(_log(spark, events), ["id"]), ["val"], measures
        ),
        measures,
    )
    as_dict = lambda df: {  # noqa: E731
        r["val"]: (r["n"], r["s"], r["hi"]) for r in df.collect()
    }
    assert as_dict(got) == as_dict(full)
