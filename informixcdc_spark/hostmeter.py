"""Host-contention instrumentation for the bench harnesses.

The round-10 verdict's one open evidence item was that every committed
bench artifact had been measured under (documented, but unquantified
per-point) neighbor steal on the shared host, so separating code
movement from host movement took forensic round-over-round argument
(PERF.md §21 reconstructs it by hand). Recording the /proc/stat STEAL
delta next to every wall number replaces that argument with a column:
~0 steal means the point is host-clean; a large value flags it as
contention-confounded and not comparable across rounds.
"""

from __future__ import annotations

import os


def steal_seconds() -> float:
    """Cumulative host steal time (cpu-seconds summed over all cpus)
    from the aggregate ``cpu`` line of ``/proc/stat`` (field 8, in
    USER_HZ ticks). Monotonic over the host's uptime — callers record
    deltas around measured regions. -1.0 when unavailable (non-Linux
    or restricted /proc)."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        # cpu user nice system idle iowait irq softirq STEAL guest ...
        return float(parts[8]) / os.sysconf("SC_CLK_TCK")
    except Exception:
        return -1.0


class StealMeter:
    """Delta reader: ``lap()`` returns steal cpu-seconds since the
    previous lap (or construction), rounded; -1.0 when the probe is
    unavailable. One instance per harness run."""

    def __init__(self) -> None:
        self._last = steal_seconds()

    def lap(self) -> float:
        if self._last < 0:
            return -1.0
        now = steal_seconds()
        d = round(now - self._last, 2)
        self._last = now
        return d
