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
from tests.conftest import examples, iterations  # noqa: E402

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
    max_examples=examples(30),
    derandomize=True,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(interleaved_log())
def test_random_interleavings_match_serial_model(spark, events):
    got = _state(apply_changes(_log(spark, events), key_cols=["id"]))
    assert got == _serial_reference(events)


@settings(
    max_examples=examples(20),
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
    max_examples=examples(50),
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


@st.composite
def interleaved_update_log(draw):
    """Like :func:`interleaved_log` but ops include UPDATE = the
    reference's two-record UPDBEF/UPDAFT shape (adjacent within the txn,
    ``ext/_informixcdcmodule.ec:74-75,1848-1856``), freely interleaved
    with other transactions' records in the global seq order."""
    txns = draw(
        st.lists(
            st.tuples(
                st.lists(
                    st.sampled_from(["I", "D", "U", "U"]),
                    min_size=1,
                    max_size=4,
                ),
                st.sampled_from(["commit", "rollback", "open"]),
            ),
            min_size=1,
            max_size=4,
        )
    )
    pending = []
    for txid, (ops, outcome) in enumerate(txns, start=1):
        chain = [("BEGINTX", txid, None)]
        for j, op in enumerate(ops):
            key = draw(_KEYS)
            tag = f"{txid}.{j}"
            if op == "U":
                chain.append(("UPDBEF", txid, (key, f"b{tag}")))
                chain.append(("UPDAFT", txid, (key, f"a{tag}")))
            elif op == "I":
                chain.append(("INSERT", txid, (key, f"i{tag}")))
            else:
                chain.append(("DELETE", txid, (key, f"d{tag}")))
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
        (seq, rt, txid, row)
        for seq, (rt, txid, row) in enumerate(events, start=1)
    ]


def _pairs_reference(events):
    """Model: committed txns' UPDBEF/UPDAFT records, in seq order per
    txn, pair adjacently among update records only."""
    committed = {tx for _, rt, tx, _ in events if rt == "COMMTX"}
    expected = set()
    prev_bef: dict[int, tuple] = {}
    for seq, rt, tx, row in events:
        if tx not in committed:
            continue
        if rt == "UPDBEF":
            prev_bef[tx] = row
        elif rt == "UPDAFT":
            before = prev_bef.pop(tx, None)
            if before is not None:
                expected.add((tx, before[1], row[1]))
        elif rt in ("INSERT", "DELETE"):
            # non-update records never break a pair: committed_events
            # filters to update records before the per-txn lag window
            continue
    return expected


@settings(
    max_examples=examples(30),
    derandomize=True,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(interleaved_update_log())
def test_update_pairs_match_model_under_replay(spark, events):
    """§2.8.4 as a property: for random interleavings delivered TWICE
    (at-least-once), update_pairs reconstructs exactly the committed
    (before, after) pairs, each exactly once, with matching keys."""
    from informixcdc_spark.cdc.apply import update_pairs

    out = update_pairs(_log(spark, events + events)).collect()
    got = {(r["transaction_id"], r["before"]["val"], r["after"]["val"]) for r in out}
    assert got == _pairs_reference(events)
    assert len(out) == len(got)  # no duplicated pair rows under replay
    for r in out:
        assert r["before"]["id"] == r["after"]["id"]


def _restart_reference(events):
    """SURVEY §2.8.2 / ext/_informixcdcmodule.ec:2172-2194 rule table."""
    begins = {tx: seq for seq, rt, tx, _ in events if rt == "BEGINTX"}
    ended = {tx for _, rt, tx, _ in events if rt in ("COMMTX", "RBTX")}
    open_begins = [s for tx, s in begins.items() if tx not in ended]
    last = max((s for s, rt, _, _ in events if rt == "COMMTX"), default=0)
    if open_begins:
        restart = min(open_begins)
    elif last > 0:
        restart = last + 1
    else:
        restart = 0
    return restart, last


@settings(
    max_examples=examples(30),
    derandomize=True,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(interleaved_log())
def test_restart_state_matches_rule_table(spark, events):
    """R2-R4 as a property: restart_state's single-row output follows
    the reference's resolution rules for every interleaving, including
    the seq==0/last!=0 'last+1' special case."""
    from informixcdc_spark.cdc.savepoints import restart_state

    row = restart_state(_log(spark, events)).collect()[0]
    assert (row["restart_seq"], row["last_committed_seq"]) == _restart_reference(
        events
    )
