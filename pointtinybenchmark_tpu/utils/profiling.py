"""Profiling helpers.

Parity target: mmdet utils/profiling.py:10 (`profile_time` contextmanager
wrapping torch autograd profiler + NVTX) — rebuilt on the JAX profiler
(xplane traces viewable in TensorBoard/XProf) plus a wall-clock timer.
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

__all__ = ["profile_time", "trace_to"]


@contextlib.contextmanager
def profile_time(trace_name: str, name: str, enabled: bool = True,
                 stream=None, end_stream=None):
    """Named wall-clock timing block; emits a jax named scope so the region
    shows up in device traces."""
    if not enabled:
        yield
        return
    import jax
    t0 = time.perf_counter()
    with jax.named_scope(f"{trace_name}/{name}"):
        yield
    dt = (time.perf_counter() - t0) * 1000
    print(f"[profile] {trace_name}.{name}: {dt:.3f} ms")


@contextlib.contextmanager
def trace_to(log_dir: str, enabled: bool = True):
    """Capture a JAX profiler trace (xplane) into log_dir."""
    if not enabled:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
