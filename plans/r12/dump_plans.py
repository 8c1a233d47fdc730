"""Dump .explain("formatted") for every registered query to text files.

Usage:
    python plans/r12/dump_plans.py --repo /root/repo --sf /root/testdata/sf0.1 \
        --suffix after --out /root/repo/plans/r12 [--only e07,e15]

Run once against the round-11 verdict commit (a worktree) with
--suffix before and once against HEAD with --suffix after; the judge
reads these files to check plan claims (Exchange counts, join
strategies, BatchEvalPython absence) without running Spark.

Plans are the ANALYZED physical plan before execution (AQE shows
isFinalPlan=false); index-building arms (e03 inc, e07 sbm25, e15
stream) build their pid-keyed scratch indexes eagerly on first call,
so the dumped plan is the warm-serve shape the bench measures.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", required=True)
    ap.add_argument("--sf", required=True)
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    sys.path.insert(0, args.repo)
    from informixcdc_spark.queries import all_queries  # noqa: E402
    from informixcdc_spark.session import get_spark  # noqa: E402

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    only = {p for p in args.only.split(",") if p}
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    os.makedirs(args.out, exist_ok=True)
    for name in sorted(qs):
        qid = name.split("_", 1)[0]
        if only and qid not in only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            df = qs[name](spark, args.sf)
            text = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # noqa: BLE001 — record, keep dumping
            text = f"ERROR building/explaining {name}: {exc}"
        path = os.path.join(args.out, f"{qid}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} @ {args.sf} ({args.suffix})\n")
            f.write(text)
            f.write("\n")
        print(f"{name}: {time.perf_counter() - t0:.1f}s -> {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
