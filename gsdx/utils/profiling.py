"""Lightweight timing + profiler hooks.

The reference has only ad-hoc `time.time()` prints (SURVEY.md §5). Here:
a stats-accumulating timer for host-level stages and a context manager
around `jax.profiler.trace` for device-level traces viewable in
TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator


class Timer:
    """Accumulating named timer. `block_until_ready` your outputs inside the
    timed region or device work will be under-counted."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            tot, cnt = self.totals[name], self.counts[name]
            lines.append(
                f"{name:30s} {tot:8.3f}s total  {tot / cnt * 1000:8.2f} ms/call"
                f"  x{cnt}"
            )
        return "\n".join(lines)

    def reset(self):
        self.totals.clear()
        self.counts.clear()


_GLOBAL_TIMER = Timer()


def timed(name: str):
    """Module-level convenience: `with timed("render"): ...`."""
    return _GLOBAL_TIMER(name)


def timing_summary() -> str:
    return _GLOBAL_TIMER.summary()


@contextlib.contextmanager
def trace_to(log_dir: str):
    """Capture a device profile: `with trace_to("/tmp/trace"): step()`."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
