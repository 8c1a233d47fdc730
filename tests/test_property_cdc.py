"""Property-based CDC semantics (SURVEY §5 test plan): for RANDOM
transaction interleavings with commits/rollbacks/opens and replays, the
engine's applied table must equal serial application of the committed
transactions' events in seq order — the reference's implicit contract
(stream totally ordered by seq_number, only committed txns materialize).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from informixcdc_spark.cdc.apply import apply_changes
from tests.test_cdc_apply import _log, _state

_KEYS = st.integers(min_value=0, max_value=5)
# ~1/7 of ops is a TRUNCATE (no key): wipes every row of the table whose
# winner position precedes it — interleaved with concurrent writers it
# exercises the (commit_seq, seq_number) floor comparison
_OPNAME = st.sampled_from(
    ["INSERT", "UPDAFT", "DELETE", "INSERT", "UPDAFT", "DELETE", "TRUNCATE"]
)


@st.composite
def _op(draw):
    name = draw(_OPNAME)
    return name, (None if name == "TRUNCATE" else draw(_KEYS))


_TXN = st.tuples(
    st.lists(_op(), min_size=1, max_size=4),
    st.sampled_from(["commit", "rollback", "open"]),
)


@st.composite
def interleaved_log(draw):
    """A seq-ordered changelog whose transactions interleave randomly."""
    txns = draw(st.lists(_TXN, min_size=1, max_size=4))
    # schedule: a shuffled merge of each txn's [begin, *ops, terminator?]
    pending = []
    for txid, (ops, outcome) in enumerate(txns, start=1):
        chain = [("BEGINTX", txid, None)]
        chain += [(op, txid, key) for op, key in ops]
        if outcome == "commit":
            chain.append(("COMMTX", txid, None))
        elif outcome == "rollback":
            chain.append(("RBTX", txid, None))
        pending.append(chain)
    events = []
    while any(pending):
        alive = [i for i, c in enumerate(pending) if c]
        i = draw(st.sampled_from(alive))
        events.append(pending[i].pop(0))
    return [
        (seq, rt, txid, (key, f"v{seq}") if key is not None else None)
        for seq, (rt, txid, key) in enumerate(events, start=1)
    ]


def _serial_reference(events):
    """Pure-Python model: committed txns' IUD events applied in COMMIT
    order (a txn's writes become visible atomically at COMMTX — the
    reference's consumer buffers until the commit record,
    ``ext/_informixcdcmodule.ec:1527-1529,2269-2299``); within a txn,
    events apply in seq order. Matches ``apply_changes``'s
    ``(commit_seq, seq_number)`` winner key — the only ordering that is
    also incrementally consistent under restart-from-watermark."""
    commit_of = {tx: seq for seq, rt, tx, _ in events if rt == "COMMTX"}
    table: dict[int, str] = {}
    applied = sorted(
        (
            e
            for e in events
            if e[2] in commit_of and (e[3] is not None or e[1] == "TRUNCATE")
        ),
        key=lambda e: (commit_of[e[2]], e[0]),
    )
    for seq, rt, tx, row in applied:
        if rt == "TRUNCATE":
            table.clear()
            continue
        key, val = row
        if rt == "DELETE":
            table.pop(key, None)
        elif rt in ("INSERT", "UPDAFT"):
            table[key] = val
    return table


# derandomize=True: r1-r3 each shipped with a red gate that "passed when
# committed" on a lucky random seed — the CI profile is deterministic with
# a real example budget, so a pass at commit time means a pass in verify
@settings(
    max_examples=30,
    derandomize=True,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(interleaved_log())
def test_random_interleavings_match_serial_model(spark, events):
    got = _state(apply_changes(_log(spark, events), key_cols=["id"]))
    assert got == _serial_reference(events)


@settings(
    max_examples=20,
    derandomize=True,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(interleaved_log())
def test_replayed_stream_is_idempotent(spark, events):
    """At-least-once delivery: the whole log delivered twice must
    produce the same table as once (§2.8.1)."""
    log = _log(spark, events + events)
    got = _state(apply_changes(log, key_cols=["id"]))
    assert got == _serial_reference(events)


@settings(
    max_examples=50,
    derandomize=True,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(interleaved_log(), st.data())
def test_restart_from_any_watermark_is_exactly_once(spark, events, data):
    """T5 as a property: pick ANY commit point as the restart watermark,
    materialize the prefix applied by a first run, then replay the WHOLE
    stream (delivered twice) against that watermark on top of the base —
    the result must equal the serial model of the full stream, for every
    watermark position (§2.8.1-3; this is the c02 query's shape with the
    split point randomized)."""
    commit_seqs = sorted(s for s, rt, _, _ in events if rt == "COMMTX")
    if not commit_seqs:
        return  # nothing committed: nothing to restart from
    watermark = data.draw(st.sampled_from(commit_seqs))
    committed_at = {
        tx for s, rt, tx, _ in events if rt == "COMMTX" and s <= watermark
    }
    first_run = [e for e in events if e[2] in committed_at]
    base = apply_changes(_log(spark, first_run), key_cols=["id"])
    replayed = _log(spark, events + events)
    got = _state(
        apply_changes(
            replayed,
            key_cols=["id"],
            last_committed_seq=watermark,
            base=base,
            # single-table restart: a TRUNCATE committed after the
            # watermark must wipe base rows from pre-watermark commits
            # (the materializer's setting — streaming/pipeline.py)
            truncate_wipes_base=True,
        )
    )
    assert got == _serial_reference(events)
