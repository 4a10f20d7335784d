"""Per-phase process monitoring (SURVEY §2.10).

Ports /root/reference/src/utils/monitor.rs:9-106 (sysinfo-based CPU% /
memory / peak sampling per phase) without external deps: CPU seconds
and RSS come from ``/proc`` on Linux, with an ``os.times()`` fallback
elsewhere.

One deliberate difference from the reference: PySpark is two OS
processes (Python driver + JVM running the local executors), so the
monitor aggregates *self plus direct children*. On a real cluster this
still only sees the driver side — executor CPU lives in Spark's own
metrics system (``spark.metrics``/the event log), which is the right
tool at 100 TB; this monitor answers the reference's question ("what
did this phase cost *this process*?"), not cluster accounting.
"""

from __future__ import annotations

import os
import time
from typing import Any

try:  # Linux
    _CLK_TCK = os.sysconf("SC_CLK_TCK")
    _PAGE = os.sysconf("SC_PAGE_SIZE")
except (ValueError, OSError, AttributeError):  # pragma: no cover
    _CLK_TCK = 100
    _PAGE = 4096


def _stat_fields(pid: int) -> list[str] | None:
    try:
        with open(f"/proc/{pid}/stat") as f:
            raw = f.read()
    except OSError:
        return None
    # comm may contain spaces/parens: split after the closing paren
    return raw.rsplit(")", 1)[1].split()


def _cpu_seconds(pid: int) -> float:
    """utime+stime of one process (fields 14/15 of /proc/pid/stat)."""
    fields = _stat_fields(pid)
    if fields is None:
        return 0.0
    return (int(fields[11]) + int(fields[12])) / _CLK_TCK


def _rss_mb(pid: int) -> float:
    fields = _stat_fields(pid)
    if fields is None:
        return 0.0
    return int(fields[21]) * _PAGE / (1024 * 1024)  # rss pages, field 24


def _child_pids(parent: int) -> list[int]:
    """Direct children via /proc/<pid>/task/<tid>/children (Linux)."""
    pids: list[int] = []
    try:
        for tid in os.listdir(f"/proc/{parent}/task"):
            try:
                with open(f"/proc/{parent}/task/{tid}/children") as f:
                    pids.extend(int(p) for p in f.read().split())
            except OSError:
                continue
    except OSError:
        return []
    return pids


def _tree_cpu_seconds() -> float:
    me = os.getpid()
    total = _cpu_seconds(me) + sum(_cpu_seconds(c) for c in _child_pids(me))
    if total > 0.0:
        return total
    t = os.times()  # portable fallback: self + reaped children
    return t.user + t.system + t.children_user + t.children_system


def _tree_rss_mb() -> float:
    me = os.getpid()
    return _rss_mb(me) + sum(_rss_mb(c) for c in _child_pids(me))


def _total_memory_mb() -> float:
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    return int(line.split()[1]) / 1024
    except OSError:  # pragma: no cover
        pass
    return 0.0


class PhaseMonitor:
    """CPU% / memory snapshots per named phase (monitor.rs SystemStats).

    ``snapshot(phase)`` returns the stats since the previous snapshot
    (or construction): cpu_percent is Δcpu-seconds / Δwall — >100 means
    more than one core busy, matching sysinfo's per-process semantics.
    """

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self._t0 = time.time()
        self._last_wall = self._t0
        self._last_cpu = _tree_cpu_seconds() if enabled else 0.0
        self._peak_mb = 0.0

    def snapshot(self, phase: str) -> dict[str, Any] | None:
        if not self.enabled:
            return None
        now = time.time()
        cpu = _tree_cpu_seconds()
        mem_mb = _tree_rss_mb()
        self._peak_mb = max(self._peak_mb, mem_mb)
        total_mb = _total_memory_mb()
        dt = max(now - self._last_wall, 1e-9)
        stats = {
            "phase": phase,
            "cpu_percent": round(100.0 * (cpu - self._last_cpu) / dt, 1),
            "memory_mb": round(mem_mb, 1),
            "memory_percent": round(100.0 * mem_mb / total_mb, 2) if total_mb else 0.0,
            "peak_memory_mb": round(self._peak_mb, 1),
            "elapsed_s": round(now - self._t0, 6),
        }
        self._last_wall = now
        self._last_cpu = cpu
        return stats
