"""Profiling / tracing utilities (SURVEY.md section 5.1: the reference only
has coarse perf_counter timing around ``trainer.predict``; here tracing is a
first-class subsystem).

  * ``trace(log_dir)`` — context manager around ``jax.profiler`` producing
    TensorBoard-viewable device traces;
  * ``timed`` / ``Timer`` — wall-clock timing with RELIABLE device
    synchronization: sync is a device->host transfer, because on tunneled
    backends (axon) ``block_until_ready`` can return before execution
    completes (see BASELINE.md), silently turning timings into dispatch rates;
  * ``steps_per_sec`` — the canonical throughput measurement used by bench.py.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable

import numpy as np


def sync(tree) -> None:
    """Reliably wait for device work producing ``tree``: pull one leaf to the
    host (device_get round-trips the data; block_until_ready is NOT trusted
    on tunneled backends)."""
    import jax

    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        np.asarray(leaves[-1])


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context; view with TensorBoard's profile plugin."""
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Accumulating wall-clock timer with device sync on stop."""

    def __init__(self):
        self.total = 0.0
        self.count = 0
        self._start = None

    def start(self):
        self._start = time.perf_counter()

    def stop(self, result_tree=None):
        if result_tree is not None:
            sync(result_tree)
        self.total += time.perf_counter() - self._start
        self.count += 1

    @property
    def mean(self) -> float:
        return self.total / max(1, self.count)


def timed(fn: Callable, *args, n: int = 10, warmup: int = 1, **kwargs):
    """Mean wall time of ``fn(*args)`` over n calls with honest sync.
    :return: (seconds_per_call, last_result)."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kwargs)
    sync(out)
    return (time.perf_counter() - t0) / n, out


def steps_per_sec(step_fn: Callable, state, *args, n_steps: int = 20):
    """Throughput of a (state, ...) -> (state, metrics) step function."""
    state, m = step_fn(state, *args)
    sync(m)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, m = step_fn(state, *args)
    sync(m)
    return n_steps / (time.perf_counter() - t0), state
