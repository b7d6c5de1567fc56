"""Profiling hooks: jax.profiler traces + rays/s counters.

The reference's only instrumentation is a wall-clock at exit
(main.rs:53, 223-227); this adds per-stage timers and optional XLA traces.
"""

from __future__ import annotations

import contextlib
import time


class Timers:
    def __init__(self):
        self.acc: dict[str, float] = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.acc[name] = self.acc.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> str:
        return " | ".join(f"{k}: {v:.2f}s" for k, v in self.acc.items())


@contextlib.contextmanager
def xla_trace(logdir: str | None):
    """Capture a jax.profiler trace when ``logdir`` is set."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def rays_per_second(n_rays: int, seconds: float) -> float:
    return n_rays / max(seconds, 1e-12)
