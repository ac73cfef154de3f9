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


# ---------------------------------------------------------------------------
# Analytic FLOP counts (utils/flops.py) — the bench's MFU denominator


def test_vgg16_conv_flops_match_literature():
    """VGG-16 convs at 224^2 are a textbook ~15.3 GMACs (30.7 GFLOPs);
    the analytic counter must reproduce that within rounding."""
    from mmbidaf_tpu.ops.vgg import VGG16_SPEC
    from mmbidaf_tpu.utils.flops import conv_stack_flops

    f = conv_stack_flops(VGG16_SPEC, 224, fc_dim=4096)
    conv_only = f - 2 * (512 * 7 * 7 * 4096) - 2 * (4096 * 4096)
    assert 30.0e9 < conv_only < 31.5e9


def test_peak_tflops_lookup():
    from mmbidaf_tpu.utils.flops import peak_bf16_tflops

    assert peak_bf16_tflops("TPU v5 lite") == 197.0
    assert peak_bf16_tflops("TPU v5e") == 197.0
    assert peak_bf16_tflops("cpu") is None


def test_flops_vs_xla_cost_analysis():
    """The analytic e2e count must agree with XLA's HloCostAnalysis of the
    actual bench program (GEMM/conv-only count => a modest under-estimate;
    band is loose because tiny shapes inflate the elementwise share)."""
    import bench as bench_mod
    from mmbidaf_tpu.data.frontend import apply_frontend, frontend_init
    from mmbidaf_tpu.data.synthetic import random_word_vectors
    from mmbidaf_tpu.models.mmbidaf import mmbidaf_decode, mmbidaf_init
    from mmbidaf_tpu.ops.vgg import TINY_SPEC
    from mmbidaf_tpu.utils.flops import e2e_decode_flops_per_video

    cfg = bench_mod.build_bench_config(quick=True)
    B = 2
    rng = np.random.default_rng(0)
    wv = random_word_vectors(rng, cfg.data.vocab_size, cfg.model.emb_dim)
    params = mmbidaf_init(jax.random.key(0), cfg, jnp.asarray(wv))
    fe = frontend_init(jax.random.key(1), cfg, vgg_spec=TINY_SPEC)
    raw = bench_mod.make_raw_batch(rng, cfg, B)
    raw = {k: jnp.asarray(v) for k, v in raw.items()}

    def step(params, fe, raw):
        batch = apply_frontend(fe, raw, cfg, TINY_SPEC)
        _, picks = mmbidaf_decode(params, batch, cfg)
        return picks

    compiled = jax.jit(step).lower(params, fe, raw).compile()
    xla_flops = compiled.cost_analysis()["flops"]
    analytic = e2e_decode_flops_per_video(cfg, TINY_SPEC) * B
    assert 0.5 * xla_flops < analytic < 1.1 * xla_flops, (
        f"analytic {analytic:.3g} vs XLA {xla_flops:.3g}"
    )


def test_train_flops_vs_xla_cost_analysis():
    """train_step_flops must agree with XLA's HloCostAnalysis of the actual
    jitted train step (fwd + bwd + adadelta/EMA/clip). GEMM-only + the
    3x-forward backprop model => a modest under-estimate at tiny shapes."""
    import bench as bench_mod
    from mmbidaf_tpu.data.synthetic import random_word_vectors, synthetic_batch
    from mmbidaf_tpu.models.mmbidaf import mmbidaf_init
    from mmbidaf_tpu.train.loop import init_train_state, make_train_step
    from mmbidaf_tpu.utils.flops import train_step_flops

    cfg = bench_mod.build_bench_config(quick=True)
    B = 2
    rng = np.random.default_rng(0)
    wv = random_word_vectors(rng, cfg.data.vocab_size, cfg.model.emb_dim)
    params = mmbidaf_init(jax.random.key(0), cfg, jnp.asarray(wv))
    state = init_train_state(jax.random.key(1), params, cfg)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(rng, cfg, batch_size=B).items()}
    train_step = make_train_step(cfg)

    compiled = jax.jit(train_step).lower(state, batch).compile()
    xla_flops = compiled.cost_analysis()["flops"]
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    analytic = train_step_flops(cfg, B, n_params)
    assert 0.4 * xla_flops < analytic < 1.2 * xla_flops, (
        f"analytic {analytic:.3g} vs XLA {xla_flops:.3g}"
    )
