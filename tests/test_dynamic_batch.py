"""DynamicBatcher: concurrent requests coalesce into one device batch,
results match the sequential library path, and failures stay scoped.

Covers serving.DynamicBatcher directly and through the tools/serve.py
daemon (--dynamic_batch path).
"""

import dataclasses
import http.client
import json
import threading
import wave as wave_mod
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pytest

from mmbidaf_tpu.config import tiny_test_config
from mmbidaf_tpu.ops.vgg import TINY_SPEC
from mmbidaf_tpu.serving import DynamicBatcher, Summarizer


@pytest.fixture(scope="module")
def serving_setup(tmp_path_factory):
    """One tiny Summarizer + 3 distinct good videos + 1 poisoned video."""
    from PIL import Image

    rng = np.random.default_rng(7)
    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, img_feat_dim=32, audio_feat_dim=cfg.data.n_mfcc
        ),
    )
    d = cfg.data
    n_samples = d.max_audio_frames * d.hop_length + d.win_length
    root = tmp_path_factory.mktemp("dynbatch_vids")
    dirs = []
    for v in range(3):
        vd = root / f"vid{v}"
        (vd / "frames").mkdir(parents=True)
        for i in range(3):
            arr = (rng.random((12, 16, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(vd / "frames" / f"f{i}.png")
        sig = (rng.standard_normal(n_samples // 3) * 8000).astype(np.int16)
        with wave_mod.open(str(vd / "audio.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(d.sample_rate)
            w.writeframes(sig.tobytes())
        sents = [f"Video {v} sentence {j} covers topic {v}{j}." for j in range(5)]
        (vd / "transcript.txt").write_text(" ".join(sents))
        dirs.append(str(vd))

    bad = root / "bad"
    (bad / "frames").mkdir(parents=True)
    (bad / "frames" / "f0.png").write_bytes(b"not a png")
    (bad / "transcript.txt").write_text("Bad video sentence.")

    s = Summarizer.init_random(cfg, seed=0, vgg_spec=TINY_SPEC)
    return s, dirs, str(bad)


def test_coalesces_and_matches_sequential(serving_setup):
    s, dirs, _ = serving_setup
    # sequential ground truth through the ordinary library path
    expected = {vd: s.summarize(vd) for vd in dirs}
    # videos are distinct, so a row↔future mix-up would be visible
    assert len(set(expected.values())) == 3

    reqs = [dirs[i % 3] for i in range(6)]
    barrier = threading.Barrier(len(reqs))

    def call(vd):
        barrier.wait()
        return batcher.submit(vd)

    with DynamicBatcher(s, max_batch_size=4, max_wait_ms=300.0) as batcher:
        with ThreadPoolExecutor(max_workers=len(reqs)) as ex:
            outs = list(ex.map(call, reqs))
    assert outs == [expected[vd] for vd in reqs]
    assert batcher.stats["requests"] == 6
    # all 6 released together with a 300 ms gather window → far fewer device
    # batches than requests (2 in the deterministic case; allow scheduler slack)
    assert 2 <= batcher.stats["batches"] <= 3
    assert batcher.stats["padded_rows"] == 4 * batcher.stats["batches"] - 6


def test_single_request_pads_to_static_shape(serving_setup):
    s, dirs, _ = serving_setup
    with DynamicBatcher(s, max_batch_size=4, max_wait_ms=1.0) as batcher:
        out = batcher.submit(dirs[0])
    assert out == s.summarize(dirs[0])
    assert batcher.stats == {"requests": 1, "batches": 1, "padded_rows": 3,
                             "rejected": 0, "bucket_splits": 0}


def test_bad_asset_fails_only_its_request(serving_setup):
    s, dirs, bad = serving_setup
    barrier = threading.Barrier(2)

    def call(vd):
        barrier.wait()
        return batcher.submit(vd)

    with DynamicBatcher(s, max_batch_size=4, max_wait_ms=200.0) as batcher:
        with ThreadPoolExecutor(max_workers=2) as ex:
            good_f = ex.submit(call, dirs[0])
            bad_f = ex.submit(call, bad)
            # the poisoned request raises in ITS caller (host decode happens
            # in the submitting thread, before batching)
            with pytest.raises((OSError, ValueError)):
                bad_f.result()
            assert good_f.result() == s.summarize(dirs[0])


def test_close_rejects_new_and_drains_queued(serving_setup):
    s, dirs, _ = serving_setup
    batcher = DynamicBatcher(s, max_batch_size=2, max_wait_ms=1.0)
    assert batcher.submit(dirs[0]) == s.summarize(dirs[0])
    batcher.close()
    with pytest.raises(RuntimeError):
        batcher.submit(dirs[0])
    batcher.close()  # idempotent


def _req(port, method, path, payload=None, timeout=120):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    body = json.dumps(payload) if payload is not None else None
    conn.request(method, path, body=body)
    resp = conn.getresponse()
    out = json.loads(resp.read() or b"{}")
    conn.close()
    return resp.status, out


def test_daemon_dynamic_batch_path(serving_setup):
    """Live server with --dynamic_batch semantics: concurrent POSTs all
    succeed, match the library output, and /healthz reports coalescing."""
    import sys

    sys.path.insert(0, "tools")
    from serve import serve

    s, dirs, bad = serving_setup
    expected = {vd: s.summarize(vd) for vd in dirs}
    batcher = DynamicBatcher(s, max_batch_size=4, max_wait_ms=200.0)
    srv = serve(s, port=0, batcher=batcher)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    port = srv.server_address[1]
    try:
        reqs = [dirs[i % 3] for i in range(5)] + [bad]
        barrier = threading.Barrier(len(reqs))

        def post(vd):
            barrier.wait()
            return _req(port, "POST", "/summarize", {"video_dir": vd})

        with ThreadPoolExecutor(max_workers=len(reqs)) as ex:
            results = list(ex.map(post, reqs))
        for vd, (status, out) in zip(reqs[:5], results[:5]):
            assert status == 200 and out["summary"] == expected[vd]
        status, out = results[5]  # poisoned request → 400, server survives
        assert status == 400 and out.get("kind") == "bad_asset"
        status, health = _req(port, "GET", "/healthz")
        assert status == 200 and health["batcher"]["requests"] >= 5
        assert health["batcher"]["batches"] < health["batcher"]["requests"]
        lat = health["latency"]["/summarize"]
        assert lat["count"] == 6 and lat["errors"] == 1  # the poisoned POST
        assert 0 < lat["p50_ms"] <= lat["p95_ms"]
    finally:
        srv.shutdown()
        batcher.close()


def test_batch_assembly_error_fails_batch_not_thread(serving_setup):
    """A batch-assembly error (e.g. rows stacked at mismatched shapes)
    fails the coalesced requests' futures and the batcher SURVIVES — a
    dead batcher thread would hang every later submit() forever."""
    from concurrent.futures import Future

    s, dirs, _ = serving_setup
    with DynamicBatcher(s, max_batch_size=4, max_wait_ms=5.0) as b:
        row0, sents0 = s._raw_row(dirs[0])
        row1, sents1 = s._raw_row(dirs[1])
        row1 = dict(row1)
        row1["frames"] = row1["frames"][:, :-1]  # mismatched resolution
        items = [(row0, sents0, Future()), (row1, sents1, Future())]
        b._run_batch(items)
        for _, _, fut in items:
            with pytest.raises(ValueError):
                fut.result(timeout=5)
        # the batcher still serves clean requests afterwards
        assert b.submit(dirs[0]) == s.summarize(dirs[0])


def test_submit_racing_close_raises_not_hangs(serving_setup, monkeypatch):
    """A request whose host decode straddles close() must raise, not
    enqueue into a queue nobody reads and block its caller forever."""
    from concurrent.futures import ThreadPoolExecutor

    s, dirs, _ = serving_setup
    b = DynamicBatcher(s, max_batch_size=2, max_wait_ms=5.0)
    real_raw = s._raw_row
    started, release = threading.Event(), threading.Event()

    def slow_raw(video_dir):
        started.set()
        assert release.wait(30)
        return real_raw(video_dir)

    monkeypatch.setattr(s, "_raw_row", slow_raw)
    with ThreadPoolExecutor(1) as ex:
        fut = ex.submit(b.submit, dirs[0])
        assert started.wait(30)
        b.close()          # closes while the submit thread is mid-decode
        release.set()
        with pytest.raises(RuntimeError, match="closed"):
            fut.result(timeout=30)


def test_max_queue_sheds_load(serving_setup):
    """With the device step blocked and max_queue pending requests queued,
    submit() rejects BEFORE any host decode: submitting the poisoned video
    raises ServerOverloadedError (never its OSError), stats count the
    rejection, and queued requests still complete once the device frees up."""
    import time

    from mmbidaf_tpu.serving import ServerOverloadedError

    s, dirs, bad = serving_setup
    release = threading.Event()
    # the batcher thread dispatches via _decode_batch_device — block THAT
    # so the request queue backs up behind the batcher
    orig = s._decode_batch_device

    def slow_decode(raw, **kw):
        assert release.wait(timeout=60)
        return orig(raw, **kw)

    s._decode_batch_device = slow_decode
    try:
        with DynamicBatcher(s, max_batch_size=1, max_wait_ms=1.0,
                            max_queue=1) as b:
            with ThreadPoolExecutor(max_workers=2) as ex:
                f0 = ex.submit(b.submit, dirs[0])  # → the (blocked) batch
                deadline = time.time() + 30
                while b._queue.qsize() > 0 and time.time() < deadline:
                    time.sleep(0.01)
                assert b._queue.qsize() == 0  # batcher holds f0's row
                f1 = ex.submit(b.submit, dirs[1])  # fills the 1-slot queue
                while b._queue.qsize() < 1 and time.time() < deadline:
                    time.sleep(0.01)
                assert b._queue.qsize() == 1
                with pytest.raises(ServerOverloadedError):
                    b.submit(bad)
                release.set()
                expected0, expected1 = s.summarize(dirs[0]), s.summarize(dirs[1])
                assert f0.result(timeout=60) == expected0
                assert f1.result(timeout=60) == expected1
            assert b.stats["rejected"] == 1
            assert b.stats["requests"] == 2
    finally:
        s._decode_batch_device = orig


def test_pipeline_depth_zero_matches_default(serving_setup):
    """pipeline_depth=0 (synchronous fetch, the r4 behavior) must produce
    the same outputs and stats as the pipelined default."""
    s, dirs, _ = serving_setup
    expected = {vd: s.summarize(vd) for vd in dirs}
    with DynamicBatcher(s, max_batch_size=2, max_wait_ms=1.0,
                        pipeline_depth=0) as b:
        assert b._completer is None
        for vd in dirs:
            assert b.submit(vd) == expected[vd]
        assert b.stats["requests"] == 3 and b.stats["batches"] == 3

    with pytest.raises(ValueError, match="pipeline_depth"):
        DynamicBatcher(s, max_batch_size=2, pipeline_depth=-1)


def test_pipelined_fetch_error_fails_batch_not_completer(serving_setup):
    """A device error surfaces at FETCH time under async dispatch — it must
    fail that batch's futures on the completion thread and leave both
    threads alive for later requests."""
    s, dirs, _ = serving_setup

    class ExplodingPicks:
        def __array__(self, *a, **kw):
            raise RuntimeError("device fault at fetch")

    orig = s._decode_batch_device
    calls = {"n": 0}

    def faulty(raw, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            return None, ExplodingPicks()
        return orig(raw, **kw)

    s._decode_batch_device = faulty
    try:
        with DynamicBatcher(s, max_batch_size=2, max_wait_ms=1.0) as b:
            with pytest.raises(RuntimeError, match="device fault"):
                b.submit(dirs[0])
            # completer survived; clean requests still flow through it
            assert b.submit(dirs[1]) == s.summarize(dirs[1])
    finally:
        s._decode_batch_device = orig
