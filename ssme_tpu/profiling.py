"""Profiling and phase-timing helpers.

The reference has no tracing/profiling (SURVEY §5.1 — only timestamped
output filenames).  Here: a context manager around ``jax.profiler`` traces
for TensorBoard/Perfetto, a device-synchronized phase timer, and a simple
throughput report for filter workloads.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard/Perfetto/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Wall-clock phase timing with device synchronization.

    Usage::

        pt = PhaseTimer()
        with pt.phase("compile"):
            out = step_fn(state)        # first call compiles
        with pt.phase("run"):
            out = step_fn(state)
        print(pt.report())
    """

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync_result=None):
        t0 = time.perf_counter()
        holder = {}
        try:
            yield holder
        finally:
            if "result" in holder:
                jax.block_until_ready(holder["result"])
            elif sync_result is not None:
                jax.block_until_ready(sync_result)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(),
                                  key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:24s} {total:10.4f}s  x{n}"
                         f"  ({total / n:.4f}s avg)")
        return "\n".join(lines)


def throughput(props: int, seconds: float,
               num_devices: Optional[int] = None) -> Dict[str, float]:
    """Particle-propagations/sec (/chip) — the BASELINE.md metric."""
    if num_devices is None:
        num_devices = max(1, len(jax.devices()))
    per_sec = props / seconds
    return {
        "propagations_per_sec": per_sec,
        "propagations_per_sec_per_chip": per_sec / num_devices,
    }


__all__ = ["trace", "PhaseTimer", "throughput"]
