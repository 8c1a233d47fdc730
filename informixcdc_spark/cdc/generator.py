"""Deterministic change-log fixtures derived from the ``orders`` table.

The reference tests by replaying a recorded binary capture
(``./tests/data/ifx_lo_read.in``, ``ext/_informixcdcmodule.ec:176-199``).
Our analog must be (a) deterministic, (b) derivable inside a query so the
DuckDB oracle can state the expected final table in closed form over the
same parquet input. So: every order spawns one transaction whose events
are fixed functions of ``o_orderkey`` (k):

========  ===========================  =======================
seq        record                       condition
========  ===========================  =======================
k*10       BEGINTX                      always
k*10+1     INSERT (full order row)      always
k*10+2     UPDBEF (original row)        k % 5 == 0
k*10+3     UPDAFT (totalprice * 1.1)    k % 5 == 0
k*10+4     DELETE                       k % 7 == 0
k*10+9     COMMTX                       k%10 != 3 and k%13 != 11
k*10+9     RBTX                         k % 10 == 3
(absent)   still-open transaction       k%10 != 3 and k%13 == 11
========  ===========================  =======================

The closed-form final state (used by the oracle SQL in
``queries/cdcq.py``) is therefore: orders with k%10!=3 (not rolled
back), k%13!=11 (committed), k%7!=0 (not deleted), with totalprice
multiplied by 1.1 where k%5==0.

Built entirely from narrow projections + unionByName — no shuffle, no
driver loop; scales linearly with the input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from informixcdc_spark.catalog import load_table
from informixcdc_spark.cdc.model import RecordType

ORDERS_TABID = 101
ORDERS_TAB = "orders"

_ROW_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


def _event(
    df: DataFrame,
    rtype: RecordType,
    seq_off: int,
    row: bool = False,
    updated_price: bool = False,
) -> DataFrame:
    k = F.col("o_orderkey")
    cols = [
        (k * 10 + seq_off).cast("long").alias("seq_number"),
        F.lit(rtype.name).alias("record_type"),
        k.cast("long").alias("transaction_id"),
        F.lit(ORDERS_TABID if row else None).cast("int").alias("tabid"),
        F.lit(ORDERS_TAB if row else None).alias("tabname"),
        F.lit(0 if row else None).cast("int").alias("flags"),
        (k * 1000).cast("long").alias("start_time")
        if rtype == RecordType.BEGINTX
        else F.lit(None).cast("long").alias("start_time"),
        (k * 1000 + 9).cast("long").alias("commit_time")
        if rtype == RecordType.COMMTX
        else F.lit(None).cast("long").alias("commit_time"),
        F.lit(1 if rtype == RecordType.BEGINTX else None).cast("int").alias("user_id"),
    ]
    if row:
        price = (
            F.col("o_totalprice") * 1.1 if updated_price else F.col("o_totalprice")
        )
        row_cols = [
            F.col(c) if c != "o_totalprice" else price.alias("o_totalprice")
            for c in _ROW_COLS
        ]
        cols.append(F.struct(*row_cols).alias("row"))
    else:
        cols.append(
            F.lit(None)
            .cast(
                "struct<o_orderkey:bigint,o_custkey:bigint,o_orderstatus:string,"
                "o_totalprice:double,o_orderdate:timestamp,o_orderpriority:string>"
            )
            .alias("row")
        )
    return df.select(*cols)


#: one materialized changelog per (session, sf_dir) — see orders_changelog
_CHANGELOG_CACHE: dict[tuple[str, str], DataFrame] = {}


def orders_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the deterministic change log described in the module doc.

    The result is persisted and cached per (session, sf_dir): ten CDC
    queries consume this same fixture, and rebuilding it per query costs
    seven orders scans each time — the round-1 bench showed fixture
    construction, not the CDC apply, dominating the c-family timings.
    In a real deployment the changelog is materialized input (a capture
    directory), not something re-derived per query, so sharing the
    materialization is the honest cost model. MEMORY_AND_DISK: ~3 rows
    per order, spills instead of OOMing at large SFs.
    """
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _CHANGELOG_CACHE.get(key)
    if cached is not None:
        return cached
    log = _build_changelog(spark, sf_dir)
    from pyspark import StorageLevel

    log = log.persist(StorageLevel.MEMORY_AND_DISK)
    _CHANGELOG_CACHE[key] = log
    return log


#: cached like the main changelog — c01/c02 both consume it
_CONFLICT_CACHE: dict[tuple[str, str], DataFrame] = {}


def orders_conflict_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cached :func:`conflict_changelog` with ``max_key`` resolved from
    the parquet (one scalar agg, metadata-sized collect)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _CONFLICT_CACHE.get(key)
    if cached is not None:
        return cached
    max_key = (
        load_table(spark, sf_dir, "orders")
        .agg(F.max("o_orderkey"))
        .collect()[0][0]
    )
    log = conflict_changelog(spark, sf_dir, int(max_key))
    from pyspark import StorageLevel

    log = log.persist(StorageLevel.MEMORY_AND_DISK)
    _CONFLICT_CACHE[key] = log
    return log


def conflict_changelog(spark: SparkSession, sf_dir: str, max_key: int) -> DataFrame:
    """Cross-transaction SAME-KEY conflicts where commit order differs
    from event-seq order — the interleaving the base fixture can never
    produce (each order's txn owns its key), added so the graded surface
    exercises commit-time visibility (the r3 property-suite find).

    Per order key k (M = ``max_key``, target key kk = k + 2M,
    seq base s = (2M + k) * 100 — disjoint from the base fixture's seqs
    and txids):

    ========  ======================================  ==============
    seq        record                                  transaction_id
    ========  ======================================  ==============
    s          BEGINTX                                 10M + 2k
    s+1        BEGINTX                                 10M + 2k + 1
    s+2        INSERT (kk, original price)             10M + 2k
    s+4        INSERT (kk, price * 2)                  10M + 2k + 1
    s+6        COMMTX (txB commits FIRST)              10M + 2k + 1
    s+9        COMMTX (txA commits LAST → wins)        10M + 2k
    ========  ======================================  ==============

    Event-seq ordering would pick txB's doubled price (seq s+4 > s+2);
    commit-order picks txA's original price (commit s+9 > s+6). Closed
    form for the oracle: every key k+2M survives with txA's row — i.e.
    the original order row with o_orderkey shifted by 2M.
    """
    orders = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    m = F.lit(int(max_key))
    s = (m * 2 + k) * 100

    def ev(rtype, seq, txid, row_price=None):
        cols = [
            seq.cast("long").alias("seq_number"),
            F.lit(rtype.name).alias("record_type"),
            txid.cast("long").alias("transaction_id"),
            F.lit(ORDERS_TABID if row_price is not None else None)
            .cast("int").alias("tabid"),
            F.lit(ORDERS_TAB if row_price is not None else None).alias("tabname"),
            F.lit(0 if row_price is not None else None).cast("int").alias("flags"),
            F.lit(None).cast("long").alias("start_time"),
            F.lit(None).cast("long").alias("commit_time"),
            F.lit(None).cast("int").alias("user_id"),
        ]
        if row_price is not None:
            row_cols = [
                (k + m * 2).cast("bigint").alias("o_orderkey")
                if c == "o_orderkey"
                else row_price.alias("o_totalprice")
                if c == "o_totalprice"
                else F.col(c)
                for c in _ROW_COLS
            ]
            cols.append(F.struct(*row_cols).alias("row"))
        else:
            cols.append(
                F.lit(None)
                .cast(
                    "struct<o_orderkey:bigint,o_custkey:bigint,o_orderstatus:string,"
                    "o_totalprice:double,o_orderdate:timestamp,o_orderpriority:string>"
                )
                .alias("row")
            )
        return orders.select(*cols)

    tx_a = m * 10 + k * 2
    tx_b = m * 10 + k * 2 + 1
    return (
        ev(RecordType.BEGINTX, s, tx_a)
        .unionByName(ev(RecordType.BEGINTX, s + 1, tx_b))
        .unionByName(ev(RecordType.INSERT, s + 2, tx_a, F.col("o_totalprice")))
        .unionByName(ev(RecordType.INSERT, s + 4, tx_b, F.col("o_totalprice") * 2))
        .unionByName(ev(RecordType.COMMTX, s + 6, tx_b))
        .unionByName(ev(RecordType.COMMTX, s + 9, tx_a))
    )


def _build_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")

    begin = _event(orders, RecordType.BEGINTX, 0)
    insert = _event(orders, RecordType.INSERT, 1, row=True)
    updbef = _event(orders.where(k % 5 == 0), RecordType.UPDBEF, 2, row=True)
    updaft = _event(
        orders.where(k % 5 == 0), RecordType.UPDAFT, 3, row=True, updated_price=True
    )
    delete = _event(orders.where(k % 7 == 0), RecordType.DELETE, 4, row=True)
    commit = _event(
        orders.where((k % 10 != 3) & (k % 13 != 11)), RecordType.COMMTX, 9
    )
    rollback = _event(orders.where(k % 10 == 3), RecordType.RBTX, 9)

    return (
        begin.unionByName(insert)
        .unionByName(updbef)
        .unionByName(updaft)
        .unionByName(delete)
        .unionByName(commit)
        .unionByName(rollback)
    )
