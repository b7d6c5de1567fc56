"""Profiling hooks.

The reference's only instrumentation is a wall-clock at exit
(reference: raytracer/src/main.rs:53, 223-227); this adds optional XLA
traces (wired to ``--trace-dir`` in the CLI).
"""

from __future__ import annotations

import contextlib


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
