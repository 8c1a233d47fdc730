"""SCD2 history table: versions, intervals, point-in-time slices.

Invariants pinned (property-based, derandomized like the rest of the
CDC property suite):

1. the ``is_current`` slice equals ``apply_changes`` on the same log —
   history and net-effect can never drift;
2. per key, version intervals are CONTIGUOUS (each version closes
   exactly where its successor opens) and at most one version is open;
3. ``as_of(C)`` equals applying only the transactions committed at or
   before C — point-in-time reads are consistent with commit order
   (truncate-free logs: a later TRUNCATE erases earlier lineage from
   history by design, see cdc/history.py docstring).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from informixcdc_spark.cdc.apply import apply_changes
from informixcdc_spark.cdc.history import as_of, history_table
from tests.test_cdc_apply import _log, _state
from tests.test_property_cdc import interleaved_log
from tests.conftest import examples, iterations  # noqa: E402


@settings(
    max_examples=examples(25),
    derandomize=True,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(interleaved_log())
def test_current_slice_equals_apply_and_intervals_contiguous(spark, events):
    hist = history_table(_log(spark, events + events), key_cols=["id"]).collect()

    current = {r["id"]: r["val"] for r in hist if r["is_current"]}
    assert current == _state(apply_changes(_log(spark, events), ["id"]))

    by_key: dict = {}
    for r in hist:
        by_key.setdefault(r["id"], []).append(r)
    for versions in by_key.values():
        versions.sort(
            key=lambda r: (r["valid_from_commit_seq"], r["valid_from_seq"])
        )
        assert sum(1 for r in versions if r["is_current"]) <= 1
        for a, b in zip(versions, versions[1:]):
            # a closes at or before b opens; strictly before would mean
            # a gap only a DELETE (which closes a, opens nothing) or a
            # same-key event between them can explain — so a must close
            # no later than b opens, and never overlap b
            assert a["valid_to_commit_seq"] is not None
            assert (a["valid_to_commit_seq"], a["valid_to_seq"]) <= (
                b["valid_from_commit_seq"],
                b["valid_from_seq"],
            )
        for r in versions[:-1]:
            assert not r["is_current"]


@settings(
    max_examples=examples(25),
    derandomize=True,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(interleaved_log(), st.data())
def test_as_of_matches_commit_prefix(spark, events, data):
    events = [e for e in events if e[1] != "TRUNCATE"]
    commit_seqs = sorted(s for s, rt, _, _ in events if rt == "COMMTX")
    if not commit_seqs:
        return
    cutoff = data.draw(st.sampled_from(commit_seqs))
    hist = history_table(_log(spark, events), key_cols=["id"])
    got = {r["id"]: r["val"] for r in as_of(hist, cutoff).collect()}
    committed_at = {
        tx for s, rt, tx, _ in events if rt == "COMMTX" and s <= cutoff
    }
    prefix = [e for e in events if e[2] in committed_at]
    assert got == _state(apply_changes(_log(spark, prefix), ["id"]))


def test_history_versions_example(spark):
    """Worked example: insert → update → delete → reinsert leaves three
    versions, intervals in commit order, only the last current."""
    events = [
        (1, "BEGINTX", 1, None),
        (2, "INSERT", 1, (1, "v1")),
        (3, "COMMTX", 1, None),
        (4, "BEGINTX", 2, None),
        (5, "UPDBEF", 2, (1, "v1")),
        (6, "UPDAFT", 2, (1, "v2")),
        (7, "COMMTX", 2, None),
        (8, "BEGINTX", 3, None),
        (9, "DELETE", 3, (1, "v2")),
        (10, "COMMTX", 3, None),
        (11, "BEGINTX", 4, None),
        (12, "INSERT", 4, (1, "v3")),
        (13, "COMMTX", 4, None),
    ]
    hist = sorted(
        history_table(_log(spark, events), ["id"]).collect(),
        key=lambda r: r["valid_from_seq"],
    )
    assert [r["val"] for r in hist] == ["v1", "v2", "v3"]
    assert [r["is_current"] for r in hist] == [False, False, True]
    # v1 closed by the update, v2 closed by the DELETE (which opened
    # no version), v3 still open
    assert hist[0]["valid_to_seq"] == 6
    assert hist[1]["valid_to_seq"] == 9
    assert hist[2]["valid_to_seq"] is None
    # point-in-time: between delete (commit 10) and reinsert (commit 13)
    assert as_of(history_table(_log(spark, events), ["id"]), 10).count() == 0
    assert {
        r["val"] for r in as_of(history_table(_log(spark, events), ["id"]), 7).collect()
    } == {"v2"}
