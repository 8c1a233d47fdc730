"""Every registered query with an oracle must match DuckDB exactly.

This mirrors the driver's t2 correctness gate (CORRECTNESS_r{N}.json) at
sf0.001 so mismatches surface during development, not at round end.
"""

from __future__ import annotations

import pytest

from informixcdc_spark.queries import all_oracle_sql, all_queries
from tests.oracle_harness import compare

_ORACLE = all_oracle_sql()
_QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(_ORACLE))
def test_query_matches_oracle(spark, sf_dir, name):
    ok, msg = compare(_QUERIES[name](spark, sf_dir), _ORACLE[name], sf_dir)
    assert ok, f"{name}: {msg}"


def test_every_query_runs(spark, sf_dir):
    # independent read-only plans: run them from a small driver pool
    # (guide §2.6 — same assertion per query, ~4x the wall of the
    # serial loop saved; also exercises concurrent construction)
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    def one(item):
        name, fn = item
        assert fn(spark, sf_dir).count() >= 0, name

    with ThreadPoolExecutor(max_workers=4) as pool:
        list(pool.map(inheritable_thread_target(one), _QUERIES.items()))


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "revenue" in df.columns


def test_registry_holds_exactly_fifty_queries():
    """The driver correctness-grades only the FIRST 50 registry entries
    (insertion order). With exactly 50 registered, every operator gets a
    per-round verdict; >50 silently drops queries out of grading, <50
    wastes slots. Guard the contract."""
    assert len(_QUERIES) == 50, sorted(_QUERIES)
    assert set(_ORACLE) <= set(_QUERIES)


def test_every_registered_query_has_an_oracle():
    """Rows-only checks are a weaker driver verdict; keep the full
    surface hash-checked."""
    missing = sorted(set(_QUERIES) - set(_ORACLE))
    assert not missing, missing


def test_bench_arm_map_matches_registry(spark, sf_dir):
    """bench.py's hardcoded ARM_MODES must list exactly the distinct
    mode literals each multi-arm query emits, and the mode filter must
    prune the other union branches (no stale arms, no missed arms)."""
    import bench
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    def one(item):
        name, arms = item
        df = _QUERIES[name](spark, sf_dir)
        assert "mode" in df.columns, name
        got = {r[0] for r in df.select("mode").distinct().collect()}
        assert got == set(arms), (name, sorted(got), arms)

    with ThreadPoolExecutor(max_workers=4) as pool:
        list(pool.map(inheritable_thread_target(one), bench.ARM_MODES.items()))
