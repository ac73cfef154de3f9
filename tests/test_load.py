"""Serving load-test harness (tools/load_test.py): concurrent mixed-length
clients against the live daemon stack, latency SLO sanity on CPU.

The measured SLO numbers live in docs/OPERATIONS.md (on-chip sweep via
``python tools/load_test.py --out docs/LOAD_r4.json``); this CPU twin
asserts the harness itself: every request succeeds under concurrency,
percentiles are ordered, throughput is counted, and the batcher path
actually coalesces.
"""

import dataclasses
import importlib.util
import os
import sys

import numpy as np
import pytest

from mmbidaf_tpu.config import tiny_test_config
from mmbidaf_tpu.ops.vgg import TINY_SPEC
from mmbidaf_tpu.serving import Summarizer


def _load_tool(name: str):
    """Import a tools/ module by explicit path without polluting sys.path
    for the rest of the pytest session (tools/profile.py would shadow the
    stdlib `profile` for every later-collected test otherwise)."""
    if name in sys.modules:
        return sys.modules[name]
    if name == "load_test":
        _load_tool("serve")  # satisfies its lazy `from serve import serve`
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools", f"{name}.py")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    saved = list(sys.path)
    try:
        spec.loader.exec_module(mod)  # tools CLIs insert their own paths
    finally:
        sys.path[:] = saved
    return mod


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    make_mixed_corpus = _load_tool("load_test").make_mixed_corpus

    cfg = tiny_test_config()
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, img_feat_dim=32, audio_feat_dim=cfg.data.n_mfcc))
    root = tmp_path_factory.mktemp("load_corpus")
    dirs = make_mixed_corpus(str(root), cfg, per_tier=1, res=(12, 16), seed=3)
    summarizers = {
        False: Summarizer.init_random(cfg, seed=0, vgg_spec=TINY_SPEC),
        True: Summarizer.init_random(cfg, seed=0, vgg_spec=TINY_SPEC,
                                     serve_buckets=True),
    }
    return summarizers, dirs


def _check_row(r, n_requests):
    assert r["ok"] == n_requests and r["errors"] == 0
    lm = r["latency_ms"]
    assert lm["p50"] <= lm["p95"] <= lm["p99"]
    # generous absolute SLO so the assertion is box-speed-proof: a tiny
    # model on CPU must answer under concurrency in single-digit seconds
    assert lm["p99"] < 60_000
    assert r["sustained_vps"] > 0
    # every tier saw traffic and got percentiles
    assert set(r["per_tier_p50_ms"]) == {"quarter", "half", "full"}


def test_mixed_corpus_tiers(setup):
    _, dirs = setup
    assert set(dirs) == {"quarter", "half", "full"}
    # tier fractions actually produce different raw lengths on disk
    n_frames = {t: len(os.listdir(os.path.join(d[0], "frames")))
                for t, d in dirs.items()}
    assert n_frames["quarter"] < n_frames["full"]


def test_sequential_config_slo(setup):
    run_config = _load_tool("load_test").run_config

    summarizers, dirs = setup
    r = run_config(summarizers[False], dirs, name="seq", clients=3,
                   requests=9, http_timeout=120.0)
    _check_row(r, 9)
    assert "batcher" not in r


def test_batcher_config_coalesces(setup):
    run_config = _load_tool("load_test").run_config

    summarizers, dirs = setup
    r = run_config(summarizers[False], dirs, name="batch", clients=3,
                   requests=9, dynamic_batch=4, batch_wait_ms=100.0,
                   http_timeout=120.0)
    _check_row(r, 9)
    b = r["batcher"]
    # 3 warmup + 9 measured requests all flowed through the batcher
    assert b["requests"] == 12
    assert 0 < b["batches"] <= b["requests"]
    # On a 1-core box thread starvation can serialize the 3 clients so no
    # two requests overlap the 100 ms gather window; coalescing is then
    # asserted deterministically by tests/test_dynamic_batch.py's direct
    # DynamicBatcher tests, so only warn here instead of flaking.
    if b["batches"] == b["requests"]:
        import warnings
        warnings.warn("no coalescing observed under HTTP load "
                      "(thread-starved box?)", stacklevel=1)


def test_bucket_grouped_config(setup):
    run_config = _load_tool("load_test").run_config

    summarizers, dirs = setup
    r = run_config(summarizers[True], dirs, name="bucket_group", clients=3,
                   requests=9, dynamic_batch=4, batch_wait_ms=20.0,
                   http_timeout=120.0)
    _check_row(r, 9)
    # bucketed summarizer recorded per-rung device-batch stats
    assert len(summarizers[True].bucket_stats) >= 1


def test_percentile_nearest_rank():
    percentile = _load_tool("load_test").percentile

    xs = [float(i) for i in range(1, 101)]
    assert percentile(xs, 50) == 50.0
    assert percentile(xs, 95) == 95.0
    assert percentile(xs, 99) == 99.0
    assert percentile([7.0], 99) == 7.0
    assert np.isnan(percentile([], 50))
