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


def _load(path: str) -> dict:
    """Load a bench artifact, accepting either bench.py's own JSON line
    (top-level "queries") or the driver's BENCH_r{N}.json wrapper, whose
    "tail" holds the last 2000 chars of stdout — enough for the JSON line
    only when per-query output is short. Fails with a pointer to
    BENCH_LOCAL.json otherwise."""
    with open(path) as f:
        art = json.load(f)
    if "queries" in art:
        return art
    tail = art.get("tail", "")
    start = tail.rfind('{"metric"')
    if start >= 0:
        try:
            return json.loads(tail[start:])
        except json.JSONDecodeError:
            pass
    sys.exit(
        f"{path}: no per-query data (driver tail truncated). "
        "Use the committed BENCH_LOCAL.json from that round instead."
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    noise = 1.5
    for a in sys.argv[1:]:
        if a.startswith("--noise"):
            noise = float(a.split("=", 1)[1]) if "=" in a else noise
    if len(args) != 2:
        print(__doc__)
        sys.exit(1)
    old = _load(args[0])
    new = _load(args[1])
    oq, nq = old["queries"], new["queries"]
    shared = sorted(set(oq) & set(nq))
    if not shared:
        # artifact-format drift: pre-round-4 bench lines used short names
        # (token before the first underscore). Re-key both sides on the
        # short form, keeping only unambiguous keys, so cross-round diffs
        # still line up.
        def shorten(q: dict) -> dict:
            by_short: dict = {}
            for name, sec in q.items():
                by_short.setdefault(name.split("_", 1)[0], []).append(sec)
            return {s: v[0] for s, v in by_short.items() if len(v) == 1}

        oq, nq = shorten(oq), shorten(nq)
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
    ratio = f"{t_new / t_old:.2f}x" if t_old else "n/a"
    print(
        f"\nshared-surface total: {t_old:.1f}s -> {t_new:.1f}s "
        f"({ratio}) over {len(shared)} queries; "
        f"noise band ±{noise}x"
    )


if __name__ == "__main__":
    main()
