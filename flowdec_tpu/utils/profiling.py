"""Profiling / RTF instrumentation (the tracing aux subsystem).

The reference has no built-in tracing (SURVEY.md §5: line-profiler pinned but
unused; RTF timing via CUDA events in enhance.py:120-136). TPU-native
equivalents:
  * `trace(logdir)` — context manager around jax.profiler traces (view with
    TensorBoard or xprof);
  * `rtf_timer` — steady-state real-time-factor measurement that accounts for
    compile vs steady state (block_until_ready, discard first call);
  * `annotate` — named TraceAnnotation spans visible in profiles.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax

__all__ = ["trace", "annotate", "rtf_timer"]


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace: `with trace('/tmp/prof'): run_steps()`."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span inside a trace (host-side annotation)."""
    return jax.profiler.TraceAnnotation(name)


def rtf_timer(
    fn: Callable[[], jax.Array],
    audio_seconds: float,
    *,
    iters: int = 10,
    warmup: int = 1,
) -> Dict[str, float]:
    """Measure real-time factor of `fn` (a jitted call returning an array).

    Returns dict(compile_time, steady_seconds_per_call, rtf)."""
    t0 = time.perf_counter()
    out = fn()
    out.block_until_ready()
    compile_time = time.perf_counter() - t0

    for _ in range(max(0, warmup - 1)):
        fn().block_until_ready()

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    out.block_until_ready()
    per_call = (time.perf_counter() - t0) / iters
    return {
        "compile_time": compile_time,
        "steady_seconds_per_call": per_call,
        "rtf": audio_seconds / per_call,
    }
