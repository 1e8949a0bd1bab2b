"""Phase timing + device tracing (SURVEY.md §5.1).

The reference relied on the Spark UI plus a hand-instrumented driver variant
(`FastMapProfiling.scala`); here phases are timed with forced device sync and
a structured report, and `device_trace` wraps `jax.profiler` for TensorBoard
traces of the jitted pipeline.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class PhaseTimer:
    """Accumulating wall-clock phase timer with device synchronization."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        """Time a phase; pass the phase's output (pytree) as `sync` via
        send() semantics or call .sync(x) inside to force completion."""
        t0 = time.perf_counter()
        try:
            yield self
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    @staticmethod
    def sync(x):
        """Force device completion (block_until_ready is unreliable on
        tunneled backends; a tiny literal transfer is authoritative)."""
        import jax
        import numpy as np
        for leaf in jax.tree_util.tree_leaves(x)[:1]:
            np.asarray(leaf).ravel()[:1]
        return x

    def report(self) -> str:
        total = sum(self.totals.values()) or 1e-9
        lines = ["phase                 total_s  calls  share"]
        for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            lines.append(f"{name:20s} {t:8.3f} {self.counts[name]:6d} "
                         f"{100 * t / total:5.1f}%")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace context (view with TensorBoard)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
