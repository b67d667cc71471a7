"""Per-stage timing observability.

The reference has a `print_timing` config flag that is parsed but never
read (SURVEY.md §5.1 — a stub). Here it is implemented for real: a
lightweight stage timer the engine uses when the flag is set, plus an
optional bridge into jax.profiler traces for device work.
"""

from __future__ import annotations

import contextlib
import sys
import time


class StageTimer:
    """Wall-clock per-stage timings; prints a summary like the reference
    prints its stats."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.stages: list[tuple[str, float]] = []

    @contextlib.contextmanager
    def stage(self, name: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stages.append((name, time.perf_counter() - t0))

    def report(self, file=sys.stderr) -> None:
        if not self.enabled or not self.stages:
            return
        total = sum(d for _, d in self.stages)
        print("Timing:", file=file)
        for name, dur in self.stages:
            print(f"  {name:<24s} {dur * 1000:9.2f} ms", file=file)
        print(f"  {'total':<24s} {total * 1000:9.2f} ms", file=file)


@contextlib.contextmanager
def device_trace(trace_dir: str | None):
    """Wrap a block in a jax.profiler trace when a directory is given."""
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
