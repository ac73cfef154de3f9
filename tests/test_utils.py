"""Utils subsystem tests: timing harness, NaN sanitizer, profiler trace."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmbidaf_tpu.utils.profiling import Timer, debug_nans, timeit, trace


def test_timeit_returns_stats():
    f = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((64, 64))
    stats = timeit(f, x, iters=3)
    assert stats["p50_s"] > 0 and stats["min_s"] <= stats["p50_s"]


def test_timer():
    with Timer() as t:
        sum(range(1000))
    assert t.elapsed_s >= 0


def test_debug_nans_catches():
    with debug_nans():
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: x / 0.0)(jnp.zeros(())).block_until_ready()
    # config restored
    assert not jax.config.jax_debug_nans


def test_trace_writes_profile(tmp_path):
    d = str(tmp_path / "prof")
    with trace(d):
        jax.jit(lambda x: x * 2)(jnp.ones((8, 8))).block_until_ready()
    # some profile artifact got written
    found = any(files for _, _, files in os.walk(d))
    assert found
