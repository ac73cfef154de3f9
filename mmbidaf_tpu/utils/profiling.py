"""Tracing / profiling subsystem (SURVEY.md §6 row 1).

The reference has nothing beyond tqdm + tensorboard curves; here:
- ``trace(dir)``: context manager around ``jax.profiler`` emitting a
  Perfetto/XProf trace for N steps,
- ``timeit``: ``block_until_ready`` wall-clock timing harness used by the
  benchmark CLI (median over iters, compile excluded),
- ``Timer``: lightweight scoped timer for host-side stages.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile everything inside the context into ``log_dir`` (XProf/Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timeit(fn: Callable, *args, iters: int = 10, warmup: int = 1) -> dict:
    """Median wall-clock of ``fn(*args)`` with device sync; compile excluded."""

    def _sync(out):
        for leaf in jax.tree.leaves(out):
            if hasattr(leaf, "block_until_ready"):
                leaf.block_until_ready()
        return out

    for _ in range(warmup):
        _sync(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn(*args))
        times.append(time.perf_counter() - t0)
    return {
        "p50_s": float(np.median(times)),
        "mean_s": float(np.mean(times)),
        "min_s": float(np.min(times)),
        "iters": iters,
    }


class Timer:
    """Scoped host-side timer: ``with Timer() as t: ...; t.elapsed_s``."""

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed_s = time.perf_counter() - self._t0
        return False


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """NaN-checking context (SURVEY §6 "race detection / sanitizers" row —
    the numerical sanitizer for a single-threaded XLA program)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
