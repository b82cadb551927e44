"""Profiling: jax.profiler traces + simple op benchmarking.

The TPU equivalent of the reference's kernel_benchmark grid search + tic/toc
tracing (SURVEY.md §5): capture XLA/TPU traces for TensorBoard, and time
jitted callables with proper device synchronization.
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/df_trace"):
    """Capture a jax.profiler trace (view with TensorBoard's profile tab)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def time_fn(fn, *args, iters: int = 20, warmup: int = 2, **kwargs):
    """Average wall time of a (possibly jitted) callable in ms, with
    block_until_ready synchronization."""
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000.0


def annotate(name: str):
    """TraceAnnotation context for nesting user regions into profiles."""
    return jax.profiler.TraceAnnotation(name)
