"""Fixture-table catalog: load the driver's parquet tables lazily.

The driver generates a TPC-H-ish star schema plus ``events`` (stream
table), ``documents`` (text corpus) and ``embeddings`` (vector table) at
``/root/testdata/sf{0.001,0.01,0.1}``; see TESTDATA.md. All reads go
through :func:`load_table` so filter pushdown and column pruning reach the
parquet scan (``spark.read.parquet`` + lazy DataFrame ops — Catalyst
prunes ``ReadSchema`` and pushes ``PushedFilters`` automatically).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor (region is
# 5 rows and nation 25 at every SF; TPC-H dims grow sub-linearly). Used by
# queries to hint broadcast() explicitly rather than trusting the size
# estimator at 100 TB fact scale.
BROADCAST_DIMS = ("region", "nation")

# (path, fingerprint) -> inferred StructType. Parquet schema inference
# launches a footer-read Spark job per spark.read.parquet call; fixture
# tables are read by every query and every bench rep, so the first load
# in a process pays the one inference job and every later load passes
# the cached schema explicitly. Fingerprinted by file size+mtime so a
# REGENERATED fixture at the same path re-infers instead of serving a
# stale schema. Cached AFTER inference (never pyarrow-translated): the
# cache must reproduce exactly what Spark's own reader inferred under
# the session's confs (e.g. nanosAsLong mapping TIMESTAMP(NANOS)->LONG).
_SCHEMA_CACHE: dict = {}


def _fingerprint(path: str):
    import os

    if os.path.isdir(path):
        return tuple(
            sorted(
                (e.name, e.stat().st_size, e.stat().st_mtime_ns)
                for e in os.scandir(path)
            )
        )
    st = os.stat(path)
    return (st.st_size, st.st_mtime_ns)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # runtime-set so they also hold on sessions we didn't build (the
    # driver harness constructs its own vanilla SparkSession).
    # session.timeZone=UTC makes any TIMESTAMP_NTZ<->TIMESTAMP cast the
    # identity on the wall clock, matching the tz-naive DuckDB oracle.
    # Set on EVERY load, not just events: a timestamp-formatting query
    # must not depend on whether events happened to load first.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/{name}.parquet"
    key = (path, _fingerprint(path))
    cached = _SCHEMA_CACHE.get(key)
    if cached is not None:
        df = spark.read.schema(cached).parquet(path)
    else:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[key] = df.schema
    if name == "events":
        # events.ts has shipped as parquet TIMESTAMP(NANOS) (arrives as
        # epoch-nanos LONG under nanosAsLong; data is µs-precision, so
        # `div 1000` is lossless) and as TIMESTAMP(MICROS, not UTC-adjusted)
        # which Spark reads as TIMESTAMP_NTZ. Normalize the LONG case;
        # keep NTZ as-is (window/date functions accept it) and let
        # epoch_micros() below bridge functions that demand TIMESTAMP.
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def epoch_micros(df: DataFrame, colname: str):
    """Exact integer epoch-microseconds for a timestamp column of ANY
    flavor (TIMESTAMP, TIMESTAMP_NTZ, or already-converted).

    ``unix_micros`` only accepts TIMESTAMP; the fixture ``events.ts`` can
    arrive as TIMESTAMP_NTZ (parquet µs, isAdjustedToUTC=false). With the
    session pinned to UTC (load_table), casting NTZ->TIMESTAMP maps the
    wall clock to the same instant DuckDB's ``epoch_us(ts)`` computes on
    the naive value, so both sides agree to the microsecond.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampNTZType

    col = F.col(colname)
    if isinstance(df.schema[colname].dataType, TimestampNTZType):
        col = col.cast("timestamp")
    return F.unix_micros(col)


def rebalance(df: DataFrame, target: int | None = None) -> DataFrame:
    """Spread an under-partitioned input across the cluster before
    CPU-heavy per-row work (hashing, shingling, vector math).

    Small fixture files arrive as a single parquet split, which would pin
    an entire operator pipeline to one core; one round-robin shuffle of
    the (tiny) input buys full parallelism downstream. At production
    scale the scan already yields >= defaultParallelism splits and this
    is a no-op — it never repartitions data that is already spread out.

    Plans that already contain a repartition are returned untouched
    WITHOUT the partition-count probe: under AQE, ``df.rdd`` materializes
    every upstream query stage to learn the final partitioning, i.e. the
    probe itself would execute the plan's shuffles at build time.

    STREAMING inputs pass through untouched: the partition probe is an
    action (illegal on a streaming plan), and micro-batch parallelism is
    the source's trigger/file-split concern — this lets the stateless
    operators (chunking, quality gates, fingerprints) compose directly
    with ``readStream``.
    """
    if df.isStreaming:
        return df
    if os.environ.get("SPARK_GRAFT_NO_REBALANCE") == "1":
        # diagnostic A/B switch (r11 verdict item 8): measure a query
        # with and without the fixture-scan rebalance in one regime —
        # never set in production or by the driver's bench
        return df
    plan = df._jdf.queryExecution().analyzed().toString()
    if "Repartition" in plan or "RebalancePartitions" in plan:
        return df
    sc = df.sparkSession.sparkContext
    n = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> None:
    """Register each fixture table as a temp view for ``spark.sql`` use."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
