"""Incremental view maintenance: delta-merge must equal full recompute.

The IVM algebra (retraction/addition weighted contributions, view merge,
TRUNCATE fallback) is verified against ``aggregate_view(apply_changes(
full_log))`` — apply_changes itself is property-verified against the
serial model in test_property_cdc, so these tests pin the view algebra
on top of already-trusted apply semantics.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from informixcdc_spark.cdc.apply import apply_changes
from informixcdc_spark.cdc.ivm import (
    aggregate_view,
    finalize_view,
    incremental_aggregate_view,
)
from tests.test_cdc_apply import _log
from tests.test_property_cdc import interleaved_log
from tests.conftest import examples, iterations  # noqa: E402

MEASURES = [("n", "count", "id"), ("s", "sum", "id"), ("m", "avg", "id")]


def _view_dict(df):
    return {
        r["val"]: (r["n"], r["s"], r["m"]) for r in df.collect()
    }


def _expected(spark, events):
    table = apply_changes(_log(spark, events), key_cols=["id"])
    return _view_dict(finalize_view(aggregate_view(table, ["val"], MEASURES), MEASURES))


@settings(
    max_examples=examples(30),
    derandomize=True,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(interleaved_log(), st.data())
def test_incremental_view_equals_recompute(spark, events, data):
    """For ANY interleaving, any restart point, and at-least-once
    delivery of the delta, merging deltas into the prefix's view equals
    recomputing the view from the full log — including the TRUNCATE
    fallback branch when a post-watermark txn truncates."""
    commit_seqs = sorted(s for s, rt, _, _ in events if rt == "COMMTX")
    if not commit_seqs:
        return
    watermark = data.draw(st.sampled_from(commit_seqs))
    committed_at = {
        tx for s, rt, tx, _ in events if rt == "COMMTX" and s <= watermark
    }
    first_run = [e for e in events if e[2] in committed_at]
    base = apply_changes(_log(spark, first_run), key_cols=["id"])
    prev = aggregate_view(base, ["val"], MEASURES)
    replayed = _log(spark, events + events)
    got = incremental_aggregate_view(
        prev,
        replayed,
        base,
        key_cols=["id"],
        group_cols=["val"],
        measures=MEASURES,
        last_committed_seq=watermark,
    )
    assert _view_dict(finalize_view(got, MEASURES)) == _expected(spark, events)


def test_unknown_measure_kind_rejected(spark):
    log = _log(spark, [(1, "BEGINTX", 1, None)])
    base = apply_changes(log, key_cols=["id"])
    with pytest.raises(ValueError, match="not in"):
        incremental_aggregate_view(
            base.limit(0),
            log,
            base,
            key_cols=["id"],
            group_cols=["val"],
            measures=[("w", "median", "id")],
        )


MEASURES_MM = MEASURES + [("lo", "min", "id"), ("hi", "max", "id")]


def _view_dict_mm(df):
    return {
        r["val"]: (r["n"], r["s"], r["m"], r["lo"], r["hi"])
        for r in df.collect()
    }


@settings(
    max_examples=examples(25),
    derandomize=True,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(interleaved_log(), st.data())
def test_incremental_minmax_equals_recompute(spark, events, data):
    """min/max via bounded recompute of affected groups: deletions that
    expose a second-best, group-membership moves, and replays must all
    land on the recompute answer — for any interleaving and restart
    point (groups here are near-per-row, so most groups vanish or churn:
    the hardest regime for extremum maintenance)."""
    commit_seqs = sorted(s for s, rt, _, _ in events if rt == "COMMTX")
    if not commit_seqs:
        return
    watermark = data.draw(st.sampled_from(commit_seqs))
    committed_at = {
        tx for s, rt, tx, _ in events if rt == "COMMTX" and s <= watermark
    }
    base = apply_changes(
        _log(spark, [e for e in events if e[2] in committed_at]),
        key_cols=["id"],
    )
    prev = aggregate_view(base, ["val"], MEASURES_MM)
    got = incremental_aggregate_view(
        prev,
        _log(spark, events + events),
        base,
        key_cols=["id"],
        group_cols=["val"],
        measures=MEASURES_MM,
        last_committed_seq=watermark,
    )
    full = aggregate_view(
        apply_changes(_log(spark, events), key_cols=["id"]),
        ["val"],
        MEASURES_MM,
    )
    assert _view_dict_mm(finalize_view(got, MEASURES_MM)) == _view_dict_mm(
        finalize_view(full, MEASURES_MM)
    )


def test_incremental_path_semi_joins_base(spark):
    """Plan pin for the scale property: the non-truncate path must read
    base ONLY through a semi join on touched keys (point lookups at
    scale), never aggregate the full base table."""
    events = [
        (1, "BEGINTX", 1, None),
        (2, "INSERT", 1, (1, "a")),
        (3, "COMMTX", 1, None),
        (4, "BEGINTX", 2, None),
        (5, "UPDBEF", 2, (1, "a")),
        (6, "UPDAFT", 2, (1, "b")),
        (7, "INSERT", 2, (2, "c")),
        (8, "COMMTX", 2, None),
    ]
    base = apply_changes(_log(spark, events[:3]), key_cols=["id"])
    prev = aggregate_view(base, ["val"], MEASURES)
    out = incremental_aggregate_view(
        prev,
        _log(spark, events),
        base,
        key_cols=["id"],
        group_cols=["val"],
        measures=MEASURES,
        last_committed_seq=3,
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftSemi" in plan
    got = _view_dict(finalize_view(out, MEASURES))
    assert got == {"b": (1, 1, 1.0), "c": (1, 2, 2.0)}


def test_view_on_orders_fixture(spark, sf_dir):
    """End-to-end on the orders changelog: maintain revenue-by-status
    incrementally across the same split c02 uses; equals recompute."""
    from informixcdc_spark.cdc.generator import orders_changelog

    log = orders_changelog(spark, sf_dir)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    mid = orders.agg((F.max("o_orderkey") / 2).cast("long")).collect()[0][0]
    watermark = mid * 10 + 9
    measures = [
        ("n_orders", "count", "o_totalprice"),
        ("revenue", "sum", "o_totalprice"),
    ]
    first = log.where(F.col("transaction_id") <= mid)
    base = apply_changes(first, key_cols=["o_orderkey"])
    prev = aggregate_view(base, ["o_orderstatus"], measures)
    got = finalize_view(
        incremental_aggregate_view(
            prev,
            log,
            base,
            key_cols=["o_orderkey"],
            group_cols=["o_orderstatus"],
            measures=measures,
            last_committed_seq=watermark,
        ),
        measures,
    )
    full = finalize_view(
        aggregate_view(
            apply_changes(log, key_cols=["o_orderkey"]),
            ["o_orderstatus"],
            measures,
        ),
        measures,
    )
    g = {r["o_orderstatus"]: r for r in got.collect()}
    f = {r["o_orderstatus"]: r for r in full.collect()}
    assert set(g) == set(f)
    for k in f:
        assert g[k]["n_orders"] == f[k]["n_orders"]
        assert g[k]["revenue"] == pytest.approx(f[k]["revenue"], rel=1e-9)


def test_view_materializer_across_batches(spark, tmp_path):
    """Streaming IVM: the maintained view equals a full recompute after
    every micro-batch — across a txn spanning batches (pending carry), an
    update+delete batch, a TRUNCATE batch (recompute fallback), and a
    replayed batch (idempotency guard)."""
    from informixcdc_spark.streaming.pipeline import ViewMaterializer

    vm = ViewMaterializer(
        spark, str(tmp_path / "state"), ["id"], ["val"], MEASURES, n_buckets=8
    )
    batches = [
        # txn1 commits two inserts; txn2 opens and stays pending
        [
            (1, "BEGINTX", 1, None),
            (2, "INSERT", 1, (1, "a")),
            (3, "INSERT", 1, (2, "a")),
            (4, "COMMTX", 1, None),
            (5, "BEGINTX", 2, None),
            (6, "INSERT", 2, (3, "b")),
        ],
        # txn2 commits from pending; txn3 updates key 1 and deletes key 2
        [
            (7, "COMMTX", 2, None),
            (8, "BEGINTX", 3, None),
            (9, "UPDBEF", 3, (1, "a")),
            (10, "UPDAFT", 3, (1, "b")),
            (11, "DELETE", 3, (2, "a")),
            (12, "COMMTX", 3, None),
        ],
        # committed TRUNCATE then a reinsert — IVM recompute fallback
        [
            (13, "BEGINTX", 4, None),
            (14, "TRUNCATE", 4, None),
            (15, "INSERT", 4, (7, "c")),
            (16, "COMMTX", 4, None),
        ],
    ]
    cumulative = []
    for bid, events in enumerate(batches):
        cumulative += events
        vm.process_batch(_log(spark, events), bid)
        got = _view_dict(vm.read_view())
        assert got == _expected(spark, cumulative), f"batch {bid}"

    before = _view_dict(vm.read_view())
    vm.process_batch(_log(spark, batches[1]), 1)  # checkpoint replay
    assert _view_dict(vm.read_view()) == before
    assert vm.read_view_state()["batch_id"] == len(batches) - 1

    # same batches through a min/max-bearing view: the persisted
    # extremal state must survive batch boundaries (carried for
    # unaffected groups, recomputed for affected ones) and the TRUNCATE
    # fallback, landing on the full recompute after every batch
    from informixcdc_spark.streaming.pipeline import ViewMaterializer as VM

    vmm = VM(
        spark, str(tmp_path / "state_mm"), ["id"], ["val"], MEASURES_MM,
        n_buckets=8,
    )
    cumulative = []
    for bid, events in enumerate(batches):
        cumulative += events
        vmm.process_batch(_log(spark, events), bid)
        full = aggregate_view(
            apply_changes(_log(spark, cumulative), key_cols=["id"]),
            ["val"],
            MEASURES_MM,
        )
        assert _view_dict_mm(vmm.read_view()) == _view_dict_mm(
            finalize_view(full, MEASURES_MM)
        ), f"mm batch {bid}"


def test_view_snapshot_gc_bounds_view_dir(spark, tmp_path):
    """View storage must stay O(GC_KEEP_VIEWS), independent of how many
    batches ran (same contract as the table materializer's snapshot GC)."""
    import os

    from informixcdc_spark.streaming.pipeline import ViewMaterializer

    vm = ViewMaterializer(
        spark, str(tmp_path / "state"), ["id"], ["val"], MEASURES, n_buckets=4
    )
    # GC_KEEP_VIEWS is 2: 4 batches (default profile) already exceed the
    # bound twice over; the full profile keeps the original 6
    n = iterations(6, 4)
    for bid in range(n):
        events = [
            (bid * 10 + 1, "BEGINTX", bid + 1, None),
            (bid * 10 + 2, "INSERT", bid + 1, (bid, f"v{bid}")),
            (bid * 10 + 3, "COMMTX", bid + 1, None),
        ]
        vm.process_batch(_log(spark, events), bid)
    view_dirs = [
        d
        for d in os.listdir(tmp_path / "state" / "view")
        if d.startswith("v") and not d.endswith(".json")
    ]
    assert len(view_dirs) <= vm.GC_KEEP_VIEWS
    assert {r["val"] for r in vm.read_view().collect()} == {
        f"v{b}" for b in range(n)
    }


def test_avg_ignores_null_measures(spark):
    """SQL AVG semantics (r4 ADVICE): NULL measure values drop out of
    the avg DENOMINATOR while COUNT(*) keeps counting the rows, and an
    all-NULL group finalizes to NULL — both in the bootstrap recompute
    and through an incremental retraction of the group's only non-null
    value."""
    null_odd = "case when id % 2 = 0 then id end"  # NULL for odd ids
    meas = [("n", "count", "id"), ("a", "avg", null_odd), ("s", "sum", null_odd)]
    t1 = [
        (1, "BEGINTX", 1, None),
        (2, "INSERT", 1, (1, "g")),
        (3, "INSERT", 1, (2, "g")),
        (4, "INSERT", 1, (3, "g")),
        (5, "INSERT", 1, (5, "h")),
        (6, "COMMTX", 1, None),
    ]
    base = apply_changes(_log(spark, t1), key_cols=["id"])
    prev = aggregate_view(base, ["val"], meas)
    view0 = {
        r["val"]: (r["n"], r["a"], r["s"])
        for r in finalize_view(prev, meas).collect()
    }
    # g: 3 rows, avg over the single non-null (id 2); h: all-NULL avg
    assert view0 == {"g": (3, 2.0, 2), "h": (1, None, None)}

    delta = [
        (7, "BEGINTX", 2, None),
        (8, "DELETE", 2, (2, "g")),
        (9, "COMMTX", 2, None),
    ]
    got = incremental_aggregate_view(
        prev,
        _log(spark, delta),
        base,
        key_cols=["id"],
        group_cols=["val"],
        measures=meas,
    )
    view1 = {
        r["val"]: (r["n"], r["a"], r["s"])
        for r in finalize_view(got, meas).collect()
    }
    # retracting the only non-null value leaves an all-NULL avg, but
    # COUNT(*) still counts the two surviving NULL-measure rows
    assert view1 == {"g": (2, None, None), "h": (1, None, None)}
    # and incremental == full recompute on the final table
    table = apply_changes(_log(spark, t1 + delta), key_cols=["id"])
    full = {
        r["val"]: (r["n"], r["a"], r["s"])
        for r in finalize_view(aggregate_view(table, ["val"], meas), meas).collect()
    }
    assert view1 == full
