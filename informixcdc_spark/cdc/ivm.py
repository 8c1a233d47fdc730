"""Incremental view maintenance over the CDC changelog.

The reference hands its consumer a raw change stream and leaves every
downstream artifact — including aggregate views — to be rebuilt by hand
(SURVEY §3.3: the consumer loop sees IUD records and maintains its own
state). This module is the consumer-side operator a CDC engine exists to
feed: keep ``SELECT group_cols, agg(...) FROM table GROUP BY group_cols``
in sync with the table by applying CHANGES, never recomputing from the
full table.

Classic IVM for distributive aggregates (self-maintainable views): each
committed net-effect change contributes a +1 (new row image) and/or a
-1 (old row image) weighted row; the view update is the weighted
aggregate of those contributions merged into the previous view. SUM and
COUNT are closed under retraction; AVG finalizes from maintained
(sum, NON-NULL count) — the per-measure non-null count is maintained
alongside the shared row count so AVG matches SQL's NULL-ignoring
semantics (an all-NULL group finalizes to NULL, and COUNT(*) keeps its
own denominator). MIN/MAX are NOT retraction-closed (a deletion can expose
an unknown second-best), so they use the standard bounded-maintenance
path instead: groups touched by any addition or retraction recompute
their extremum from the updated rows of JUST those groups — cost
O(rows in affected groups), never a full-table rescan — while
unaffected groups carry their previous value forward.

Scale shape: the incremental path shuffles O(touched keys) + O(affected
groups) rows per refresh — independent of table size — vs O(table) for
a recompute. Both the retraction lookup (base ⋉ touched keys) and the
view merge are key-hash joins with no sort; the contribution aggregate
partial-combines map-side like every other agg in this engine.

A committed TRUNCATE in the delta invalidates every base-derived group
(the view is no longer expressible as prev + delta), so
:func:`incremental_aggregate_view` detects that case — one scalar probe
job over the (tiny) terminator records — and falls back to recomputing
from ``apply_changes(delta, base=base, truncate_wipes_base=True)``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from informixcdc_spark.cdc.apply import apply_changes, committed_events
from informixcdc_spark.cdc.model import RecordType

#: measure spec: (output_name, kind, source_column); kind in KINDS.
#: count ignores its source column (count(*) semantics). The source may
#: be a plain row-field name or a SQL expression over row fields.
KINDS = ("sum", "count", "avg", "min", "max")


def _internal_cols(measures: Sequence[tuple[str, str, str]]) -> list[str]:
    """The maintained (pre-finalize) column names: one running sum AND
    one non-null count per sum/avg measure, one extremum per min/max
    measure, plus the shared row count. The non-null count is AVG's
    NULL-ignoring denominator (COUNT(*) cannot share it) and SUM's
    all-NULL detector (a retraction-balanced running sum of 0 is
    indistinguishable from SQL's NULL-on-no-values without it)."""
    cols = [f"_s_{name}" for name, kind, _ in measures if kind in ("sum", "avg")]
    cols += [f"_c_{name}" for name, kind, _ in measures if kind in ("sum", "avg")]
    cols += [f"_m_{name}" for name, kind, _ in measures if kind in ("min", "max")]
    return cols + ["_n_rows"]


def _extremal_aggs(measures):
    return [
        (F.min if kind == "min" else F.max)(F.expr(col)).alias(f"_m_{name}")
        for name, kind, col in measures
        if kind in ("min", "max")
    ]


def _ns_join(left: DataFrame, right: DataFrame, group_cols, how: str) -> DataFrame:
    """Null-safe equi-join on the group columns (NULL group values must
    match each other, which a plain column-list join would split)."""
    r = right
    for c in group_cols:
        r = r.withColumnRenamed(c, f"_r_{c}")
    cond = None
    for c in group_cols:
        e = left[c].eqNullSafe(r[f"_r_{c}"])
        cond = e if cond is None else (cond & e)
    out = left.join(r, cond, how)
    return out if how == "left_semi" else out.drop(*[f"_r_{c}" for c in group_cols])


def _contrib_aggs(measures, weight_col):
    aggs = []
    for name, kind, col in measures:
        if kind in ("sum", "avg"):
            # F.expr: the source may be a plain row-field name or a SQL
            # expression over row fields (e.g. an integer-cents cast).
            # NULL measure values contribute nothing (w*NULL is NULL,
            # skipped by SUM) — matching SQL SUM/AVG numerators.
            aggs.append(
                F.sum(F.col(weight_col) * F.expr(col)).alias(f"_s_{name}")
            )
            # weighted NON-NULL count, retraction-closed like any sum
            # (a deleted NULL-measure row retracts 0)
            aggs.append(
                F.sum(
                    F.col(weight_col) * F.expr(col).isNotNull().cast("long")
                ).cast("long").alias(f"_c_{name}")
            )
    aggs.append(F.sum(F.col(weight_col)).cast("long").alias("_n_rows"))
    return aggs


def finalize_view(state: DataFrame, measures) -> DataFrame:
    """Maintained state -> user-facing view columns."""
    cols = list(state.columns)
    group_cols = [
        c
        for c in cols
        if not c.startswith(("_s_", "_c_", "_m_")) and c != "_n_rows"
    ]
    out = [F.col(c) for c in group_cols]
    for name, kind, _ in measures:
        if kind == "sum":
            # SQL SUM over zero non-NULL values is NULL; the maintained
            # running sum alone would report a retraction-balanced 0
            out.append(
                F.when(F.col(f"_c_{name}") > 0, F.col(f"_s_{name}")).alias(name)
            )
        elif kind == "count":
            out.append(F.col("_n_rows").alias(name))
        elif kind in ("min", "max"):
            out.append(F.col(f"_m_{name}").alias(name))
        else:  # avg = sum / non-null count; try_divide: an all-NULL
            # group has denominator 0 and must finalize to NULL (SQL AVG
            # semantics), not raise under ANSI mode
            out.append(
                F.try_divide(F.col(f"_s_{name}"), F.col(f"_c_{name}")).alias(name)
            )
    return state.select(*out)


def aggregate_view(
    table: DataFrame, group_cols: Sequence[str], measures
) -> DataFrame:
    """Full recompute of the MAINTAINED state (not finalized) from a
    materialized table — the bootstrap and the fallback path."""
    weighted = table.withColumn("_w", F.lit(1).cast("long"))
    return weighted.groupBy(*group_cols).agg(
        *_contrib_aggs(measures, "_w"), *_extremal_aggs(measures)
    )


def _net_changes(
    changelog: DataFrame,
    key_cols: Sequence[str],
    last_committed_seq: int = 0,
) -> DataFrame:
    """Per touched key, the winning committed change — row fields plus
    ``record_type`` (DELETE = key removed). Same (commit_seq, seq_number)
    winner convention as :func:`apply_changes`."""
    events = committed_events(
        changelog, last_committed_seq, dedup_records=False
    )
    flat = events.select(
        "_commit_seq", "seq_number", "record_type", "row.*"
    )
    payload = [
        c
        for c in flat.columns
        if c not in ("_commit_seq", "seq_number", "record_type")
        and c not in key_cols
    ]
    winner = flat.groupBy(*key_cols).agg(
        F.max_by(
            F.struct(F.col("record_type"), *[F.col(c) for c in payload]),
            F.struct(F.col("_commit_seq"), F.col("seq_number")),
        ).alias("_w")
    )
    return winner.select(
        *key_cols,
        F.col("_w.record_type").alias("record_type"),
        *[F.col(f"_w.{c}").alias(c) for c in payload],
    )


def _has_committed_truncate(
    changelog: DataFrame, last_committed_seq: int
) -> bool:
    """One scalar job over terminator/TRUNCATE records only (a sliver of
    the log; the scan prunes on record_type)."""
    commits = (
        changelog.where(F.col("record_type") == RecordType.COMMTX.name)
        .where(F.col("seq_number") > F.lit(last_committed_seq))
        .select(F.col("transaction_id").alias("_tx"))
    )
    truncs = changelog.where(
        F.col("record_type") == RecordType.TRUNCATE.name
    ).select("transaction_id")
    return (
        truncs.join(
            commits, truncs["transaction_id"] == commits["_tx"], "left_semi"
        ).limit(1).count()
        > 0
    )


def incremental_aggregate_view(
    prev_view: DataFrame,
    changelog: DataFrame,
    base: DataFrame,
    key_cols: Sequence[str],
    group_cols: Sequence[str],
    measures,
    last_committed_seq: int = 0,
) -> DataFrame:
    """Merge a delta changelog into a maintained view state.

    ``prev_view`` must be the maintained state of ``base`` (from
    :func:`aggregate_view` or a previous call); ``changelog`` is the new
    portion of the stream (at-least-once delivery tolerated — replayed
    commits at or below ``last_committed_seq`` are discarded exactly like
    :func:`apply_changes`). Returns the updated maintained state; apply
    :func:`finalize_view` for user-facing columns.

    SINGLE-TABLE contract: net changes are keyed on ``key_cols`` alone
    (same as :func:`apply_changes` — filter a multi-table log per table,
    or wrap like ``apply_changes_by_table``, before maintaining a view).
    """
    for _, kind, _ in measures:
        if kind not in KINDS:
            raise ValueError(f"measure kind {kind!r} not in {KINDS}")
    if _has_committed_truncate(changelog, last_committed_seq):
        table = apply_changes(
            changelog,
            key_cols,
            last_committed_seq=last_committed_seq,
            base=base,
            truncate_wipes_base=True,
        )
        return aggregate_view(table, group_cols, measures)

    changes = _net_changes(changelog, key_cols, last_committed_seq)
    # additions: post-change row images (insert or update-after)
    adds = changes.where(
        F.col("record_type") != RecordType.DELETE.name
    ).drop("record_type").withColumn("_w", F.lit(1).cast("long"))
    # retractions: the PRE-change row images — base rows whose key was
    # touched (update: retract old, add new; delete: retract only).
    # Semi-join on the (small) touched-key set; at scale this is the
    # pruned point-lookup side, never a full base scan shuffle.
    touched = changes.select(*key_cols)
    olds = base.join(touched, list(key_cols), "left_semi").withColumn(
        "_w", F.lit(-1).cast("long")
    )
    cols = [*key_cols, *[c for c in adds.columns if c not in key_cols]]
    contrib = adds.select(*cols).unionByName(olds.select(*cols))
    delta = contrib.groupBy(*group_cols).agg(*_contrib_aggs(measures, "_w"))

    # merge: union + re-aggregate (≤2 rows per group) rather than a
    # full-outer join — groups NULL group-key values correctly (an outer
    # join's equality would split them) and partial-combines map-side
    linear = [
        c for c in _internal_cols(measures) if not c.startswith("_m_")
    ]
    merged = (
        prev_view.select(*group_cols, *linear)
        .unionByName(delta.select(*group_cols, *linear))
        .groupBy(*group_cols)
        .agg(*[F.sum(c).alias(c) for c in linear])
        .withColumn("_n_rows", F.col("_n_rows").cast("long"))
    ).where(F.col("_n_rows") > 0)

    extremal = [(n, k, c) for n, k, c in measures if k in ("min", "max")]
    if not extremal:
        return merged

    # bounded min/max maintenance: any group that gained or lost a row
    # recomputes its extremum from the updated rows of JUST that group
    # (untouched base rows of the group + this delta's additions);
    # unaffected groups carry the previous value. Null-safe joins so
    # NULL group values stay one group.
    affected = contrib.select(*group_cols).dropDuplicates()
    untouched_base = base.join(touched, list(key_cols), "left_anti")
    upd_rows = untouched_base.select(*base.columns).unionByName(
        adds.drop("_w").select(*base.columns)
    )
    ext = _ns_join(upd_rows, affected, group_cols, "left_semi").groupBy(
        *group_cols
    ).agg(*_extremal_aggs(extremal))

    out = _ns_join(
        merged, affected.withColumn("_aff", F.lit(True)), group_cols, "left"
    )
    out = _ns_join(out, ext, group_cols, "left")
    prev_ext = prev_view.select(
        *group_cols,
        *[F.col(f"_m_{n}").alias(f"_pm_{n}") for n, _, _ in extremal],
    )
    out = _ns_join(out, prev_ext, group_cols, "left")
    return out.select(
        *group_cols,
        *linear,
        *[
            F.when(
                F.coalesce(F.col("_aff"), F.lit(False)), F.col(f"_m_{n}")
            )
            .otherwise(F.col(f"_pm_{n}"))
            .alias(f"_m_{n}")
            for n, _, _ in extremal
        ],
    )
