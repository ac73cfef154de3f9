"""HTTP serving daemon (tools/serve.py): live-server round trip, batch
endpoint, health check, and the bad-request contract (a poisoned request
returns 400 and the server keeps serving)."""

import http.client
import json
import threading
import wave as wave_mod

import dataclasses
import numpy as np
import pytest

from mmbidaf_tpu.config import tiny_test_config
from mmbidaf_tpu.ops.vgg import TINY_SPEC
from mmbidaf_tpu.serving import Summarizer


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    import sys
    sys.path.insert(0, "tools")
    from serve import serve

    rng = np.random.default_rng(0)
    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, img_feat_dim=32, audio_feat_dim=cfg.data.n_mfcc
        ),
    )
    s = Summarizer.init_random(cfg, seed=0, vgg_spec=TINY_SPEC)
    srv = serve(s, port=0)  # ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()

    # two videos on disk: one good, one with a corrupt PNG
    from PIL import Image

    root = tmp_path_factory.mktemp("vids")
    d = cfg.data
    dirs = {}
    for name, poison in (("good", False), ("bad", True)):
        vd = root / name
        (vd / "frames").mkdir(parents=True)
        if poison:
            (vd / "frames" / "f0.png").write_bytes(b"not a png")
        else:
            arr = (rng.random((10, 12, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(vd / "frames" / "f0.png")
        n_samples = d.max_audio_frames * d.hop_length + d.win_length
        sig = (rng.standard_normal(n_samples // 3) * 8000).astype(np.int16)
        with wave_mod.open(str(vd / "audio.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(d.sample_rate)
            w.writeframes(sig.tobytes())
        (vd / "transcript.txt").write_text(
            f"The {name} video starts. It continues here. It ends now."
        )
        dirs[name] = str(vd)

    yield srv.server_address[1], dirs, s
    srv.shutdown()


def _req(port, method, path, payload=None):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    body = json.dumps(payload) if payload is not None else None
    conn.request(method, path, body=body)
    resp = conn.getresponse()
    out = json.loads(resp.read() or b"{}")
    conn.close()
    return resp.status, out


def test_healthz(server):
    port, _, _ = server
    status, out = _req(port, "GET", "/healthz")
    assert status == 200 and out["ok"] is True
    assert out["decode_mode"] == "greedy"  # the live Summarizer's mode
    assert "parallelism" not in out  # plain single-device Summarizer


def test_parallelism_info_live_mesh():
    """_parallelism_info reports the live mesh layout (DP × TP) that
    /healthz exposes for ops."""
    import jax

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    import os
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    from serve import _parallelism_info

    from mmbidaf_tpu.config import MeshConfig

    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, img_feat_dim=32, audio_feat_dim=cfg.data.n_mfcc
        ),
        mesh=MeshConfig(num_data=4, num_model=2, tp_vgg=True),
    )
    s = Summarizer.init_random(cfg, vgg_spec=TINY_SPEC,
                               serve_batch_size=4, data_parallel=True)
    info = _parallelism_info(s)
    assert info == {
        "mesh_axes": {"data": 4, "model": 2},
        "dp_shards": 4,
        "sp_audio": False,
        "tp_vgg": True,
    }
    assert _parallelism_info(
        Summarizer.init_random(
            dataclasses.replace(cfg, mesh=MeshConfig()), vgg_spec=TINY_SPEC
        )
    ) is None


def test_summarize_roundtrip(server):
    port, dirs, s = server
    status, out = _req(port, "POST", "/summarize", {"video_dir": dirs["good"]})
    assert status == 200
    assert out["summary"] == s.summarize(dirs["good"])  # same as the library call
    assert "video" in out["summary"]


def test_summarize_batch(server):
    port, dirs, _ = server
    status, out = _req(
        port, "POST", "/summarize_batch",
        {"video_dirs": [dirs["good"], dirs["good"]]},
    )
    assert status == 200 and len(out["summaries"]) == 2
    assert out["summaries"][0] == out["summaries"][1]


def test_poisoned_request_returns_400_and_server_survives(server):
    port, dirs, _ = server
    status, out = _req(port, "POST", "/summarize", {"video_dir": dirs["bad"]})
    assert status == 400 and "error" in out
    # server still healthy and serving afterwards
    status, out = _req(port, "POST", "/summarize", {"video_dir": dirs["good"]})
    assert status == 200 and out["summary"]


def test_long_mode_server(server, tmp_path, rng):
    """A use_long server windows past the max_sentences bucket and matches
    the library's summarize_long."""
    import sys
    sys.path.insert(0, "tools")
    from serve import serve

    port, dirs, s = server
    srv = serve(s, port=0, use_long=True)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        cfg = s.cfg
        vd = tmp_path / "longvid"
        (vd / "frames").mkdir(parents=True)
        from PIL import Image

        Image.fromarray((rng.random((10, 12, 3)) * 255).astype(np.uint8)).save(
            vd / "frames" / "f0.png"
        )
        d = cfg.data
        n_samples = d.max_audio_frames * d.hop_length + d.win_length
        sig = (rng.standard_normal(n_samples // 4) * 8000).astype(np.int16)
        with wave_mod.open(str(vd / "audio.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(d.sample_rate)
            w.writeframes(sig.tobytes())
        # transcript well beyond the T_sent bucket forces windowing
        (vd / "transcript.txt").write_text(
            " ".join(f"Long sentence {j} covers point {j}."
                     for j in range(3 * d.max_sentences))
        )
        status, out = _req(
            srv.server_address[1], "POST", "/summarize", {"video_dir": str(vd)}
        )
        assert status == 200
        assert out["summary"] == s.summarize_long(str(vd))
    finally:
        srv.shutdown()


def test_bad_payloads(server):
    port, _, _ = server
    status, out = _req(port, "POST", "/summarize", {"wrong_field": 1})
    assert status == 400
    status, _ = _req(port, "POST", "/nope", {})
    assert status == 404
    status, _ = _req(port, "GET", "/nope")
    assert status == 404


def test_latency_stats_percentiles():
    """Nearest-rank percentiles: p50 <= p95 even at tiny window sizes (a
    floor-based index once reported p95 < p50 at n=2)."""
    import sys
    sys.path.insert(0, "tools")
    from serve import _LatencyStats

    st = _LatencyStats()
    st.record("/x", 0.010, ok=True)
    st.record("/x", 0.100, ok=False)
    snap = st.snapshot()["/x"]
    assert snap["count"] == 2 and snap["errors"] == 1
    assert snap["p50_ms"] == 10.0 and snap["p95_ms"] == 100.0
    for ms in (20, 30, 40, 50):
        st.record("/x", ms / 1e3, ok=True)
    snap = st.snapshot()["/x"]
    # n=6 sorted [10,20,30,40,50,100]: p50 = ceil(3)-1 -> 30, p95 -> 100
    assert snap["p50_ms"] == 30.0 and snap["p95_ms"] == 100.0
