"""Diff two bench artifacts (BENCH_LOCAL.json shape) query by query.

Usage: python compare_bench.py OLD.json NEW.json [--noise 1.5]

Prints per-query ratios sorted worst-first, flags changes outside the
host-noise band (PERF.md §6: back-to-back identical runs swing up to
1.5x on this container), and summarizes totals. Exit code 0 always —
this is a reporting tool, not a gate; the oracle gate owns correctness.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    noise = 1.5
    for a in sys.argv[1:]:
        if a.startswith("--noise"):
            noise = float(a.split("=", 1)[1]) if "=" in a else noise
    if len(args) != 2:
        print(__doc__)
        sys.exit(1)
    with open(args[0]) as f:
        old = json.load(f)
    with open(args[1]) as f:
        new = json.load(f)
    oq, nq = old["queries"], new["queries"]
    shared = sorted(set(oq) & set(nq))
    rows = sorted(
        ((nq[k] / oq[k] if oq[k] else float("inf"), k) for k in shared),
        reverse=True,
    )
    print(f"{'query':44} {'old':>8} {'new':>8} {'ratio':>7}  flag")
    for ratio, k in rows:
        flag = ""
        if ratio > noise:
            flag = "REGRESSION?"
        elif ratio < 1 / noise:
            flag = "improved"
        print(f"{k:44} {oq[k]:8.3f} {nq[k]:8.3f} {ratio:7.2f}  {flag}")
    only_old = sorted(set(oq) - set(nq))
    only_new = sorted(set(nq) - set(oq))
    if only_old:
        print("removed:", ", ".join(only_old))
    if only_new:
        print("added:", ", ".join(only_new))
    t_old = sum(oq[k] for k in shared)
    t_new = sum(nq[k] for k in shared)
    print(
        f"\nshared-surface total: {t_old:.1f}s -> {t_new:.1f}s "
        f"({t_new / t_old:.2f}x) over {len(shared)} queries; "
        f"noise band ±{noise}x"
    )


if __name__ == "__main__":
    main()
