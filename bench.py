"""Benchmark harness: run the named query surface and print one JSON line.

Usage: python bench.py  (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS)

Each query is forced end-to-end with a noop sink (full execution, no
driver collect). A warmup query amortizes JVM/session startup out of the
per-query numbers; total wall (the headline metric) covers the measured
query executions only, matching how the driver compares against
BASELINE.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from informixcdc_spark.queries import bench_queries as all_queries  # noqa: E402
from informixcdc_spark.session import get_spark  # noqa: E402


def format_line(
    per_query: dict[str, float],
    errors: dict[str, str],
    sf: float,
    steal_total: float | None = None,
    steal_query: dict[str, float] | None = None,
) -> str:
    """One compact JSON line, guaranteed under the driver's stdout tail.

    The driver captures only a 2000-char tail of stdout and parses the
    JSON line out of THAT (r2: a long AnalysisException string pushed the
    line past the tail and the round recorded "parsed": null). Per-query
    keys are shortened to their id prefix ("c01_cdc_apply..." -> "c01",
    ids are unique), error strings are capped, and a hard length check
    drops detail before it can ever overflow.
    """
    total = round(sum(per_query.values()), 3)

    def short(n: str) -> str:
        return n.split("_", 1)[0]

    # id prefixes must stay unique or the dict comprehension would
    # silently drop a timing; fall back to full names on collision
    if len({short(n) for n in per_query}) != len(per_query):
        short = lambda n: n  # noqa: E731

    out = {
        "metric": "total_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": {short(n): t for n, t in sorted(per_query.items())},
        "sf": sf,
    }
    if steal_total is not None and steal_total >= 0:
        # host-contention context for the wall numbers (cpu-seconds of
        # /proc/stat steal over the whole measured run)
        out["steal_sec"] = steal_total
    if steal_query:
        # /proc/stat steal observed during each query's RECORDED (best)
        # rep: ~0 means that wall number is host-clean, large means the
        # point is contention-confounded and should be discarded by any
        # mechanical consumer (r11 verdict item 1 — both r11 driver runs
        # were voided by unquantified-per-point neighbor steal)
        out["steal"] = {short(n): s for n, s in sorted(steal_query.items())}
    if errors:
        out["errors"] = {short(n): e[:80] for n, e in sorted(errors.items())[:8]}
    line = json.dumps(out)
    if len(line) > 1900:  # belt-and-braces: never exceed the driver tail
        # drop detail in diagnostic-first order; the metric/queries core
        # of the contract line survives as long as possible
        for k in ("steal", "errors"):
            out.pop(k, None)
            line = json.dumps(out)
            if len(line) <= 1900:
                return line
        out["queries"] = {}
        line = json.dumps(out)
    return line


#: multi-arm queries: each returns a UNION of branches tagged with a
#: literal "mode" column, so a `mode = '<arm>'` filter lets Catalyst
#: constant-fold the other branches away (PruneFilters +
#: PropagateEmptyRelation) and the arm executes ALONE — these 1-rep
#: timings attribute each query's cost to its graded arms in
#: BENCH_LOCAL.json. Kept honest by tests/test_queries.py::
#: test_bench_arm_map_matches_registry.
ARM_MODES = {
    "a24_sequence_packing": ["pack", "chunk"],
    "a26_weighted_mixture": ["mix", "dsir", "dsel", "temp"],
    "e01_dedup_exact": ["exact", "spans", "ranges", "lines", "doclines"],
    "e03_minhash_lsh_jaccard": ["pairs", "bounded", "inc"],
    "e09_token_stats": ["tok", "bpe", "abpe", "ulm"],
    "e07_knn_exact_and_lsh": ["exact", "lsh", "bm25", "sbm25", "rp"],
    "e12_embedding_near_dups": ["lsh", "semdedup"],
    "e15_ann_ivf": ["ivf", "kmeans", "stream", "pq", "ivfpq", "sq"],
    "e20_dedup_clusters": ["cc", "pagerank"],
    "e27_decontamination": ["exact", "coarse", "fuzzy"],
}


def _steal_seconds() -> float:
    """Cumulative host STEAL time (cpu-seconds across all cpus) from
    /proc/stat. Per-query deltas of this separate host contention from
    code movement mechanically — the round-10 verdict's one open
    evidence gap was bench artifacts measured under (documented but
    unquantified-per-query) neighbor steal, forcing forensic
    round-over-round argument; the recorded column replaces it. -1.0
    when /proc/stat is unavailable (non-Linux)."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        # cpu user nice system idle iowait irq softirq STEAL ...
        return float(parts[8]) / os.sysconf("SC_CLK_TCK")
    except Exception:
        return -1.0


def _max_job_id(spark) -> int:
    """Highest Spark job id so far (monotonic, retention-proof — the
    max of the retained ids IS the latest id). Per-query deltas count
    jobs launched: a steal-INDEPENDENT fixed-overhead signal — eager
    collects, schema-inference reads, and extra AQE materializations
    show up as job-count regressions even when host noise swamps the
    wall column. Via the UI REST API (statusTracker's group-scoped
    listing misses streaming queries' job-grouped jobs). -1 when
    unavailable."""
    import urllib.request

    try:
        app_id = spark.sparkContext.applicationId
        port = spark.sparkContext.getConf().get("spark.ui.port", "4040")
        url = f"http://127.0.0.1:{port}/api/v1/applications/{app_id}/jobs"
        with urllib.request.urlopen(url, timeout=10) as r:
            jobs = json.load(r)
        return max((int(j["jobId"]) for j in jobs), default=0)
    except Exception:
        return -1


def _shuffle_write_bytes(spark) -> int:
    """Cumulative shuffle WRITE bytes over completed stages via the UI
    REST API (scale_bench.py's probe). Shuffle bytes are the scale
    signal idle-core wall time hides; per-query deltas here make byte
    regressions visible round-over-round at sf0.1. -1 when unavailable."""
    import urllib.request

    try:
        app_id = spark.sparkContext.applicationId
        port = spark.sparkContext.getConf().get("spark.ui.port", "4040")
        url = (
            f"http://127.0.0.1:{port}/api/v1/applications/{app_id}"
            f"/stages?status=complete"
        )
        with urllib.request.urlopen(url, timeout=10) as r:
            stages = json.load(r)
        return sum(int(s.get("shuffleWriteBytes", 0)) for s in stages)
    except Exception:
        return -1


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(
        app_name="informixcdc-spark-bench",
        # UI on for the per-query shuffle-byte probe (same probe as
        # scale_bench.py): byte regressions surface at sf0.1 in
        # BENCH_LOCAL.json without waiting for a scale run
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    # warmup: trigger JVM, parquet footer reads, codegen
    queries["q01_revenue_by_nation"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    # warmup the Python/Arrow worker pool too (first mapInPandas otherwise
    # pays daemon + worker startup inside its measured time)
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    # Per-query best-of-N: back-to-back identical runs on this host swing
    # up to 1.5x from neighbor noise; the minimum is the reproducible
    # steady-state cost of the plan (what a cluster scheduler would see).
    # Every query runs under a hard wall-clock guard in a worker thread:
    # one pathological plan (r1: e33's optimizer blowup) must never zero
    # out the whole round's bench artifact — it gets an "errors" entry
    # and the JSON line still prints.
    # 3 reps: the r3 registry benches 43 queries (merged from 88), so
    # best-of-3 still runs fewer total executions than r2's best-of-2
    # while cutting the recorded total's host-noise swing further.
    reps = int(os.environ.get("SPARK_GRAFT_REPS", "3"))
    per_query_timeout = float(os.environ.get("SPARK_GRAFT_QUERY_TIMEOUT", "300"))
    # Steal-robust retries (r11 verdict item 1): when the recorded
    # (best) rep ran under host steal above this bound, the wall number
    # measured the neighbors, not the code — take extra reps hunting for
    # a clean one, bounded by a rep cap and a per-query wall budget so a
    # permanently-contended host still finishes the bench. Additions
    # only: the timed region per rep and the best-of-reps rule are
    # unchanged (steal slows a rep down, never speeds it up, so min-wall
    # still picks the cleanest rep available).
    steal_clean_bound = float(os.environ.get("SPARK_GRAFT_STEAL_BOUND", "0.5"))
    max_reps = int(os.environ.get("SPARK_GRAFT_MAX_REPS", "6"))
    retry_budget_sec = float(os.environ.get("SPARK_GRAFT_RETRY_BUDGET", "90"))
    # and a RUN-level cap on total extra-rep wall: under steady low-grade
    # contention every query is "confounded", and doubling 43 queries'
    # reps would push the whole bench past the driver's run window — the
    # global budget bounds the worst case at old-duration + this many
    # seconds of retries
    retry_total_sec = float(os.environ.get("SPARK_GRAFT_RETRY_TOTAL", "240"))
    retry_total_spent = 0.0
    per_query: dict[str, float] = {}
    errors: dict[str, str] = {}

    import concurrent.futures

    pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)

    def run_once(name: str) -> float:
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    shuffle_mb: dict[str, float] = {}
    steal_sec: dict[str, float] = {}
    job_count: dict[str, int] = {}
    steal_start = _steal_seconds()

    for name in sorted(queries):
        best = float("inf")
        best_steal = -1.0
        best_bytes = -1
        rep_i = 0
        extra_spent = 0.0
        while True:
            if rep_i >= reps:
                # steal-robust extension: the base reps are done; keep
                # going only while the recorded rep is confounded and
                # budget remains (r11 verdict item 1)
                if (
                    best == float("inf")
                    or best_steal <= steal_clean_bound
                    or rep_i >= max_reps
                    or extra_spent >= retry_budget_sec
                    or retry_total_spent >= retry_total_sec
                ):
                    break
            rep_i += 1
            pre = _shuffle_write_bytes(spark)
            jobs_pre = _max_job_id(spark)
            steal_pre = _steal_seconds()
            fut = pool.submit(run_once, name)
            try:
                took = fut.result(timeout=per_query_timeout)
                if rep_i > reps:
                    extra_spent += took
                    retry_total_spent += took
                # steal observed DURING the rep that gets recorded:
                # when the best rep's steal is ~0 the wall number is
                # host-clean; a large value flags a confounded point
                steal_now = (
                    _steal_seconds() - steal_pre if steal_pre >= 0 else -1.0
                )
                if took < best:
                    best = took
                    best_steal = steal_now
                    if steal_now >= 0:
                        steal_sec[name] = round(steal_now, 2)
                post = _shuffle_write_bytes(spark)
                if pre >= 0 and post >= pre:
                    d = post - pre
                    best_bytes = d if best_bytes < 0 else min(best_bytes, d)
                jobs_post = _max_job_id(spark)
                if jobs_pre >= 0 and jobs_post >= jobs_pre:
                    # min across reps: warm reps are the steady state
                    # (first rep may pay one-time index/fixture builds)
                    d = jobs_post - jobs_pre
                    if name not in job_count or d < job_count[name]:
                        job_count[name] = d
            except concurrent.futures.TimeoutError:
                spark.sparkContext.cancelAllJobs()
                errors[name] = f"timeout>{per_query_timeout}s"
                # the stuck call may be hung at PLAN time (no job to
                # cancel) — abandon this pool so later queries still run
                pool.shutdown(wait=False, cancel_futures=True)
                pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)
                break
            except Exception as exc:  # noqa: BLE001 — record, keep benching
                errors[name] = f"{type(exc).__name__}: {exc}"[:300]
                break
        if best != float("inf"):
            per_query[name] = round(best, 3)
        if best_bytes >= 0:
            shuffle_mb[name] = round(best_bytes / 1e6, 2)

    # Per-ARM attribution pass (diagnostics only — never in the headline
    # total): one filtered 1-rep run per arm of each multi-arm query.
    # Arms that build incremental indexes at DataFrame-construction time
    # (e03 'inc', e15 'stream') pay that build in EVERY arm's timing, so
    # arm seconds are attribution signals, not additive decompositions.
    arm_sec: dict[str, dict[str, float]] = {}
    if os.environ.get("SPARK_GRAFT_ARM_TIMINGS", "1") != "0":
        from pyspark.sql import functions as F

        def run_arm(name: str, arm: str) -> float:
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).where(F.col("mode") == arm).write.format(
                "noop"
            ).mode("overwrite").save()
            return time.perf_counter() - t0

        for name, arms in ARM_MODES.items():
            if name not in per_query:
                continue  # errored/timed out above: skip its arms too
            for arm in arms:
                fut = pool.submit(run_arm, name, arm)
                try:
                    arm_sec.setdefault(name, {})[arm] = round(
                        fut.result(timeout=per_query_timeout), 3
                    )
                except concurrent.futures.TimeoutError:
                    spark.sparkContext.cancelAllJobs()
                    pool.shutdown(wait=False, cancel_futures=True)
                    pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)
                    break
                except Exception:  # noqa: BLE001 — diagnostics must not break bench
                    break

    steal_total = (
        round(_steal_seconds() - steal_start, 2) if steal_start >= 0 else -1.0
    )
    print(
        format_line(per_query, errors, sf, steal_total, steal_sec), flush=True
    )
    # Full-resolution artifact (complete names, untruncated errors) —
    # the stdout line is capped to the driver's 2000-char tail, so
    # round-over-round per-query regressions are answerable only from
    # this file. Committed each round as BENCH_LOCAL.json.
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_LOCAL.json"), "w"
        ) as f:
            json.dump(
                {
                    "sf": sf,
                    "reps": reps,
                    "total_sec": round(sum(per_query.values()), 3),
                    "queries": dict(sorted(per_query.items())),
                    # min-across-reps shuffle WRITE MB per query (UI
                    # REST delta) — compare round-over-round for byte
                    # regressions that idle-core wall time hides
                    "shuffle_write_mb": dict(sorted(shuffle_mb.items())),
                    # /proc/stat steal cpu-seconds observed during each
                    # query's RECORDED (best) rep + run total: ~0 means
                    # the wall number is host-clean, large means the
                    # point is contention-confounded — the mechanical
                    # separation PERF.md §21 used to argue by hand
                    "steal_sec": dict(sorted(steal_sec.items())),
                    "steal_total_sec": steal_total,
                    # min-across-reps Spark JOBS launched per query —
                    # the steal-INDEPENDENT fixed-overhead signal: an
                    # eager collect / inference read / extra AQE
                    # materialization regresses this column even when
                    # host noise swamps wall time
                    "job_count": dict(sorted(job_count.items())),
                    # per-arm 1-rep seconds for multi-arm queries (see
                    # ARM_MODES) — attributes graded-arm overhead
                    "arm_sec": {n: arm_sec[n] for n in sorted(arm_sec)},
                    "errors": dict(sorted(errors.items())),
                },
                f,
                indent=1,
            )
    except OSError:
        pass  # a read-only checkout must not break the stdout contract
    # abandoned timeout threads are non-daemon; never let them block exit
    os._exit(0)


if __name__ == "__main__":
    main()
