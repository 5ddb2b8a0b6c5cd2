"""Profiling hooks — the mx.profiler / MXNET_PROFILER_AUTOSTART analog.

The reference's per-op chrome-trace profiler (mxnet src/profiler/profiler.cc,
SURVEY.md §5) maps to jax.profiler XPlane traces viewable in
TensorBoard/Perfetto. Enable with env RESNET_TPU_PROFILE=<logdir> (the
AUTOSTART analog) or the context manager / Solver hooks.

Also provides ``input_overhead``, the step-time comparison used by
tools/bench_input.py to MEASURE the <5% input-overhead target: the same
train step timed with device-resident data vs fed through the full
RecordIter -> prefetch -> H2D pipeline.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Callable, Iterator, Optional

import jax


@contextlib.contextmanager
def maybe_trace(logdir: Optional[str] = None) -> Iterator[None]:
    """Trace this block to TensorBoard if a logdir is given (or via env)."""
    logdir = logdir or os.environ.get("RESNET_TPU_PROFILE")
    if not logdir:
        yield
        return
    with jax.profiler.trace(logdir):
        yield


def time_fn(fn: Callable, *args, iters: int = 20, warmup: int = 5) -> float:
    """Median-free steady-state seconds/call (block_until_ready)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    tic = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - tic) / iters


def input_overhead(step_time_with_pipeline: float,
                   step_time_device_data: float) -> float:
    """Fractional input-pipeline overhead (north-star target: < 0.05)."""
    if step_time_device_data <= 0:
        return 0.0
    return max(0.0, step_time_with_pipeline / step_time_device_data - 1.0)
