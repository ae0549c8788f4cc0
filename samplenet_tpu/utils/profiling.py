"""Profiling/tracing surface (new relative to the reference, which only has
wall-clock epoch timing — SURVEY.md §5).

  * `trace(log_dir)` — context manager around jax.profiler traces (view in
    TensorBoard / Perfetto).
  * `StepTimer` — per-step wall-clock EMA with tunnel-aware sync (pulls a
    scalar, since block_until_ready does not synchronise through the axon
    tunnel; see bench.py).
  * `annotate` — named trace region.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)


def force_sync(value) -> float:
    """Forces device execution to finish; returns the scalar sum pulled."""
    import jax.numpy as jnp

    return float(jnp.sum(value))


class StepTimer:
    """EMA step timer; call mark(output) each step with any step output."""

    def __init__(self, momentum: float = 0.9):
        self.momentum = momentum
        self.ema_ms: float | None = None
        self._last = time.perf_counter()

    def mark(self, output=None) -> float:
        if output is not None:
            force_sync(output)
        now = time.perf_counter()
        dt_ms = (now - self._last) * 1e3
        self._last = now
        self.ema_ms = (dt_ms if self.ema_ms is None
                       else self.momentum * self.ema_ms
                       + (1 - self.momentum) * dt_ms)
        return dt_ms
