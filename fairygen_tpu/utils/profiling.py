"""Profiling / tracing hooks.

The reference has no profiling infrastructure (SURVEY.md §5 — tqdm bars
only).  Here: jax.profiler traces, a lightweight step timer that forces
device sync (essential on the tunneled axon backend where
``block_until_ready`` can be a no-op), and annotation contexts that show up
in xprof/tensorboard.
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an xprof trace (view with tensorboard --logdir)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in traces (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


def force_sync(x) -> float:
    """Force full device execution + a scalar fetch; returns the scalar.

    On remote/tunneled backends this is the only reliable sync."""
    leaves = jax.tree.leaves(x)
    acc = jnp.float32(0)
    for leaf in leaves:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            acc = acc + leaf.astype(jnp.float32).sum()
    return float(acc)


class StepTimer:
    """Rolling wall-clock timer with forced sync."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.times = []
        self._n = 0
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        if result is not None:
            force_sync(result)
        dt = time.perf_counter() - self._t0
        self._n += 1
        if self._n > self.warmup:
            self.times.append(dt)
        return dt

    @property
    def mean(self):
        return sum(self.times) / max(len(self.times), 1)

    @property
    def best(self):
        return min(self.times) if self.times else float("nan")
