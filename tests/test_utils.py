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


def test_initialize_distributed_noop_without_coordinator(monkeypatch):
    from mmbidaf_tpu.parallel.mesh import initialize_distributed

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    assert initialize_distributed() is False


def test_config_dict_roundtrip():
    from mmbidaf_tpu.config import Config, config_from_dict, config_to_dict

    cfg = config_from_dict({"model": {"hidden_size": 99}, "train": {"lr": 0.1}})
    assert cfg.model.hidden_size == 99 and cfg.train.lr == 0.1
    d = config_to_dict(cfg)
    assert d["model"]["hidden_size"] == 99
    import pytest as _pytest

    with _pytest.raises(ValueError):
        config_from_dict({"model": {"not_a_field": 1}})


def test_trace_summary(tmp_path):
    from mmbidaf_tpu.utils.trace_summary import summarize_trace

    d = str(tmp_path / "prof2")
    with trace(d):
        f = jax.jit(lambda x: (x @ x).sum())
        f(jnp.ones((128, 128))).block_until_ready()
    rows = summarize_trace(d, top_k=10)
    assert isinstance(rows, list)
    # CPU traces may label ops differently; just require the schema
    for r in rows:
        assert {"name", "total_ms", "pct", "hlo"} <= set(r)
