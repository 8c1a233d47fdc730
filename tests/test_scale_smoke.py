"""Scale smoke: the CDC apply pipeline at ~8x the largest fixture.

Correctness at sf0.01 is the driver's gate; this test probes HEADROOM —
the same plan executing against millions of change records without
collect()s, stragglers, or state blowups. The scaled corpus is built by
unioning key-shifted copies of the sf0.1 changelog where the shift is a
multiple of lcm(5, 7, 10, 13, 11) = 10010, so every generator condition
(k%5 updates, k%7 deletes, k%10 rollbacks, k%13 opens) is preserved and
the net-effect row count must be EXACTLY copies x the base count — a
closed-form check with no oracle re-derivation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from informixcdc_spark.cdc.apply import apply_changes
from informixcdc_spark.cdc.generator import orders_changelog

_LCM = 10010  # lcm of every modulus the generator uses
_COPIES = 8


def test_cdc_apply_scales_linearly(spark):
    sf_dir = "/root/testdata/sf0.1"
    log = orders_changelog(spark, sf_dir)
    base_count = apply_changes(log, key_cols=["o_orderkey"]).count()
    assert base_count > 0

    max_key = log.agg(F.max("transaction_id")).collect()[0][0]
    stride = ((max_key // _LCM) + 1) * _LCM  # multiple of every modulus

    def shifted(i: int):
        off = i * stride
        passthrough = [
            c for c in log.columns
            if c not in ("seq_number", "transaction_id", "row")
        ]
        return log.select(
            (F.col("seq_number") + F.lit(off * 10)).alias("seq_number"),
            (F.col("transaction_id") + F.lit(off)).alias("transaction_id"),
            *passthrough,
            F.col("row").withField(
                "o_orderkey", F.col("row.o_orderkey") + F.lit(off)
            ).alias("row"),
        )

    big = shifted(0)
    for i in range(1, _COPIES):
        big = big.unionByName(shifted(i))

    applied = apply_changes(big, key_cols=["o_orderkey"])
    assert applied.count() == _COPIES * base_count


def test_salted_skew_join_scales_linearly(spark):
    """The salted-join pattern at ~4.8M events: replicating every event
    8x multiplies each hot key's row count 8x (the skew gets WORSE, the
    exact situation salting exists for); per-segment aggregates must
    come out exactly 8x the base."""
    from informixcdc_spark.catalog import load_table
    from informixcdc_spark.queries.relational import q25_salted_skew_join

    sf_dir = "/root/testdata/sf0.1"
    base = {
        r["c_mktsegment"]: r["n_events"]
        for r in q25_salted_skew_join(spark, sf_dir).collect()
    }
    events = load_table(spark, sf_dir, "events")
    big = events
    for i in range(1, 8):
        big = big.unionByName(
            events.withColumn("event_id", F.col("event_id") + F.lit(i * 10_000_000))
        )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    salted_events = big.withColumn("_salt", F.pmod(F.hash("event_id"), F.lit(8)))
    salted_cust = customer.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(8)]))
    )
    got = {
        r["c_mktsegment"]: r["n"]
        for r in (
            salted_events.join(
                salted_cust,
                (F.col("user_id") == F.col("c_custkey"))
                & (salted_events["_salt"] == salted_cust["_salt"]),
            )
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
    }
    assert got == {k: 8 * v for k, v in base.items()}


def test_star_cc_scales_linearly(spark):
    """Connected components at 8x: 2000 disjoint 50-node chains
    (100k nodes / 98k edges), then 8 shifted copies (800k nodes).
    Closed form: exactly copies * 2000 clusters, every one of size 50
    with the chain head as its label — and the round count must NOT grow
    with data volume (it depends on max component diameter, which is
    unchanged; that is the whole point of star contraction at scale)."""
    from informixcdc_spark.operators.dedup import dedup_clusters_star

    chains, length = 2000, 50
    n = chains * length  # node i belongs to chain i // length

    def graph(copies: int):
        ids = spark.range(copies * n).select(F.col("id").alias("doc_id"))
        # edge i -> i+1 within a chain; last node of each chain emits none
        edges = (
            spark.range(copies * n)
            .where((F.col("id") % length) != length - 1)
            .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
        )
        return edges, ids

    base_stats: dict = {}
    edges, ids = graph(1)
    base = dedup_clusters_star(edges, ids, "doc_id", stats=base_stats)
    sizes = base.groupBy("cluster_id").count()
    assert sizes.count() == chains
    assert sizes.agg(F.min("count"), F.max("count")).collect()[0] == (length, length)

    big_stats: dict = {}
    edges8, ids8 = graph(_COPIES)
    big = dedup_clusters_star(edges8, ids8, "doc_id", stats=big_stats)
    sizes8 = big.groupBy("cluster_id").count()
    assert sizes8.count() == _COPIES * chains
    assert sizes8.agg(F.min("count"), F.max("count")).collect()[0] == (length, length)
    # every label is a chain head (id ≡ 0 mod length)
    assert big.where(F.col("cluster_id") % length != 0).count() == 0
    assert big_stats["rounds"] <= base_stats["rounds"] + 1


def test_decontamination_scales_linearly(spark):
    """The broadcast decontamination path at 8x: the benchmark side is
    pinned to the original copy (so the broadcast hash set is constant)
    while the train side is replicated with shifted ids. Closed form:
    every copy k>=1 flags the same contaminated set as the base PLUS its
    copies of the benchmark docs themselves (identical text => full-hit,
    contamination exactly 1.0), so
    total = C0 + (copies-1) * (C0 + B)."""
    from pyspark.sql import functions as F

    from informixcdc_spark.catalog import load_table
    from informixcdc_spark.operators.dedup import decontaminate, doc_shingles

    sf_dir = "/root/testdata/sf0.1"
    offset = 1_000_000  # offset % 97 != 0: shifted copies of bench docs
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bench_pred = (F.col("doc_id") % 97 == 0) & (F.col("doc_id") < offset)

    c0 = decontaminate(docs, "doc_id", "text", bench_pred).count()
    # bench docs that produce at least one 3-shingle (self-hit in copies)
    b = (
        doc_shingles(docs.where(bench_pred), "doc_id", "text")
        .where(F.size(F.array_distinct("shingles")) > 0)
        .count()
    )
    assert c0 > 0 and b > 0

    big = docs
    for k in range(1, _COPIES):
        big = big.unionByName(
            docs.select(
                (F.col("doc_id") + k * offset).alias("doc_id"), "text"
            )
        )
    got = decontaminate(big, "doc_id", "text", bench_pred)
    assert got.count() == c0 + (_COPIES - 1) * (c0 + b)
    # the benchmark copies are fully contaminated, exactly
    full = got.where(
        (F.col("doc_id") >= offset) & ((F.col("doc_id") % offset) % 97 == 0)
    )
    assert full.where(F.col("contamination") != 1.0).count() == 0
    assert full.count() == (_COPIES - 1) * b


def test_incremental_view_scales_and_matches_recompute(spark):
    """IVM at ~8x: maintain revenue-by-status across a mid-log restart
    split on the 8x key-shifted changelog. The incremental result must
    (a) equal the full recompute at 8x and (b) show exactly 8x the
    base per-status row counts (the generator moduli are preserved by
    the stride, so group membership replicates exactly)."""
    from informixcdc_spark.cdc.ivm import (
        aggregate_view,
        finalize_view,
        incremental_aggregate_view,
    )

    sf_dir = "/root/testdata/sf0.1"
    log = orders_changelog(spark, sf_dir)
    measures = [
        ("n_orders", "count", "o_totalprice"),
        ("revenue", "sum", "o_totalprice"),
    ]
    base_counts = {
        r["o_orderstatus"]: r["n_orders"]
        for r in finalize_view(
            aggregate_view(
                apply_changes(log, key_cols=["o_orderkey"]), ["o_orderstatus"], measures
            ),
            measures,
        ).collect()
    }

    max_key = log.agg(F.max("transaction_id")).collect()[0][0]
    stride = ((max_key // _LCM) + 1) * _LCM

    def shifted(i: int):
        off = i * stride
        passthrough = [
            c for c in log.columns
            if c not in ("seq_number", "transaction_id", "row")
        ]
        return log.select(
            (F.col("seq_number") + F.lit(off * 10)).alias("seq_number"),
            (F.col("transaction_id") + F.lit(off)).alias("transaction_id"),
            *passthrough,
            F.col("row").withField(
                "o_orderkey", F.col("row.o_orderkey") + F.lit(off)
            ).alias("row"),
        )

    big = shifted(0)
    for i in range(1, _COPIES):
        big = big.unionByName(shifted(i))

    mid = (_COPIES // 2) * stride  # split between copy 3 and copy 4
    watermark = mid * 10 + 9
    first_half = big.where(F.col("transaction_id") <= mid)
    base = apply_changes(first_half, key_cols=["o_orderkey"])
    prev = aggregate_view(base, ["o_orderstatus"], measures)
    got = {
        r["o_orderstatus"]: (r["n_orders"], r["revenue"])
        for r in finalize_view(
            incremental_aggregate_view(
                prev,
                big,
                base,
                key_cols=["o_orderkey"],
                group_cols=["o_orderstatus"],
                measures=measures,
                last_committed_seq=watermark,
            ),
            measures,
        ).collect()
    }
    full = {
        r["o_orderstatus"]: (r["n_orders"], r["revenue"])
        for r in finalize_view(
            aggregate_view(
                apply_changes(big, key_cols=["o_orderkey"]),
                ["o_orderstatus"],
                measures,
            ),
            measures,
        ).collect()
    }
    assert set(got) == set(full) == set(base_counts)
    for k in full:
        assert got[k][0] == full[k][0] == _COPIES * base_counts[k]
        assert got[k][1] == pytest.approx(full[k][1], rel=1e-9)
