"""AOT serving artifacts (mmbidaf_tpu/export.py): export → reload parity,
model-code-free loading in a fresh process, and misuse errors."""

import dataclasses
import json
import os
import subprocess
import sys
import wave as wave_mod

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmbidaf_tpu.config import MeshConfig, tiny_test_config
from mmbidaf_tpu.export import (
    ExportedDecoder,
    ExportedSummarizer,
    export_summarizer,
    _raw_specs,
)
from mmbidaf_tpu.ops.vgg import TINY_SPEC
from mmbidaf_tpu.serving import Summarizer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_cfg():
    cfg = tiny_test_config()
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, img_feat_dim=32, audio_feat_dim=cfg.data.n_mfcc
        ),
    )


def random_raw(cfg, rng, batch, frame_hw):
    """A plausible raw batch at the exported shapes (ragged masks)."""
    specs = _raw_specs(cfg, batch, frame_hw)
    raw = {}
    for k, s in specs.items():
        if k == "text_ids":
            raw[k] = rng.integers(0, cfg.data.vocab_size, s.shape).astype(np.int32)
        elif k == "frames":
            raw[k] = (rng.random(s.shape) * 255).astype(np.uint8)
        elif k == "waveform":
            raw[k] = rng.standard_normal(s.shape).astype(np.float32)
        else:  # masks: ragged valid prefixes
            m = np.zeros(s.shape, np.float32)
            m[..., : max(1, s.shape[-1] // 2)] = 1.0
            raw[k] = m
    return raw


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    cfg = make_cfg()
    summ = Summarizer.init_random(cfg, seed=3, vgg_spec=TINY_SPEC)
    out = str(tmp_path_factory.mktemp("artifact"))
    export_summarizer(summ, out, batch_size=2, frame_hw=(12, 16))
    return out, summ


def test_export_roundtrip_parity(artifact, rng):
    """Reloaded artifact reproduces the live jitted decode exactly."""
    out, summ = artifact
    dec = ExportedDecoder(out)
    raw = random_raw(summ.cfg, rng, batch=2, frame_hw=(12, 16))
    log_p, picks = dec.decode_raw(raw)
    live_lp, live_picks = summ._decode(
        summ.params, summ.fe_params, {k: jnp.asarray(v) for k, v in raw.items()}
    )
    np.testing.assert_array_equal(picks, np.asarray(live_picks))
    np.testing.assert_allclose(log_p, np.asarray(live_lp), rtol=0, atol=0)


def test_exported_decoder_fresh_process(artifact, rng, tmp_path):
    """The artifact serves from a process that never builds the model:
    only ``mmbidaf_tpu.export`` + jax + numpy are imported."""
    out, summ = artifact
    raw = random_raw(summ.cfg, rng, batch=2, frame_hw=(12, 16))
    np.savez(tmp_path / "raw.npz", **raw)
    want_lp, want_picks = ExportedDecoder(out).decode_raw(raw)
    code = (
        "import sys, numpy as np\n"
        f"sys.path.insert(0, {REPO!r})\n"
        "from mmbidaf_tpu.export import ExportedDecoder\n"
        f"raw = dict(np.load({str(tmp_path / 'raw.npz')!r}))\n"
        f"log_p, picks = ExportedDecoder({out!r}).decode_raw(raw)\n"
        f"np.savez({str(tmp_path / 'out.npz')!r}, log_p=log_p, picks=picks)\n"
    )
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": ""}
    subprocess.run([sys.executable, "-c", code], check=True, env=env,
                   timeout=300, cwd=REPO)
    got = np.load(tmp_path / "out.npz")
    np.testing.assert_array_equal(got["picks"], want_picks)
    np.testing.assert_array_equal(got["log_p"], want_lp)


def make_video_dirs(tmp_path, cfg, rng, n, frame_hw=(12, 16)):
    """Synthetic on-disk video dirs (frames + wav + transcript)."""
    from PIL import Image

    d = cfg.data
    n_samples = d.max_audio_frames * d.hop_length + d.win_length
    h, w_ = frame_hw
    dirs = []
    for v in range(n):
        vd = tmp_path / f"vid{v}"
        (vd / "frames").mkdir(parents=True)
        for i in range(3):
            arr = (rng.random((h, w_, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(vd / "frames" / f"f{i}.png")
        sig = (rng.standard_normal(n_samples // 2) * 8000).astype(np.int16)
        with wave_mod.open(str(vd / "audio.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(d.sample_rate)
            w.writeframes(sig.tobytes())
        sents = [f"Clip {v} sentence {j} about topic {j}." for j in range(5)]
        (vd / "transcript.txt").write_text(" ".join(sents))
        dirs.append(str(vd))
    return dirs


def test_exported_summarizer_matches_live(artifact, tmp_path, rng):
    """End-to-end from video dirs: artifact serving == live Summarizer,
    including the pad-to-static-batch tail path (3 requests over batch 2)."""
    out, summ = artifact
    dirs = make_video_dirs(tmp_path, summ.cfg, rng, 3)
    got = ExportedSummarizer(out).summarize_batch(dirs)
    want = summ.summarize_batch(dirs)
    assert got == want
    assert all(isinstance(s, str) and s for s in got)


def test_export_refuses_nondeterministic_modes(artifact):
    _, summ = artifact
    topk = Summarizer.init_random(summ.cfg, seed=0, vgg_spec=TINY_SPEC,
                                  mode="topk", topk=2)
    with pytest.raises(ValueError, match="greedy"):
        export_summarizer(topk, "/tmp/never-written")


def test_decode_raw_shape_errors(artifact, rng):
    out, summ = artifact
    dec = ExportedDecoder(out)
    raw = random_raw(summ.cfg, rng, batch=2, frame_hw=(12, 16))
    bad = dict(raw)
    bad["frames"] = bad["frames"][:, :, :8]  # wrong H
    with pytest.raises(ValueError, match="frames"):
        dec.decode_raw(bad)
    missing = {k: v for k, v in raw.items() if k != "waveform"}
    with pytest.raises(KeyError, match="waveform"):
        dec.decode_raw(missing)


def test_exported_summarizer_frame_hw_mismatch(artifact, tmp_path, rng):
    """Frames at a different resolution than the export must error clearly,
    not silently recompile or crash inside XLA."""
    out, summ = artifact
    (vd,) = make_video_dirs(tmp_path, summ.cfg, rng, 1,
                            frame_hw=(24, 32))  # not the exported 12x16
    with pytest.raises(ValueError, match="frame_hw"):
        ExportedSummarizer(out).summarize(vd)


def test_serve_daemon_artifact_mode(artifact, tmp_path, rng):
    """tools/serve.py can serve an artifact: live HTTP round trip matches
    the live Summarizer, and a frame-shape mismatch 400s (not 500s)."""
    import http.client
    import sys
    import threading

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from serve import serve

    out, summ = artifact
    art = ExportedSummarizer(out)
    art.warmup()
    srv = serve(art, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        dirs = make_video_dirs(tmp_path, summ.cfg, rng, 1)
        (bad,) = make_video_dirs(tmp_path / "bad", summ.cfg, rng, 1,
                                 frame_hw=(24, 32))

        def req(path, payload):
            conn = http.client.HTTPConnection(
                "127.0.0.1", srv.server_address[1], timeout=120)
            conn.request("POST", path, body=json.dumps(payload))
            resp = conn.getresponse()
            body = json.loads(resp.read() or b"{}")
            conn.close()
            return resp.status, body

        status, got = req("/summarize", {"video_dir": dirs[0]})
        assert status == 200
        assert got["summary"] == summ.summarize(dirs[0])
        status, got = req("/summarize", {"video_dir": bad})
        assert status == 400 and "frame_hw" in got["error"]
        status, got = req("/summarize_batch", {"video_dirs": dirs * 3})
        assert status == 200 and len(got["summaries"]) == 3
    finally:
        srv.shutdown()
        srv.server_close()


def test_export_cli_data_parallel(tmp_path):
    """tools/export_artifact.py --data_parallel produces a mesh-stamped
    artifact (8-dev CPU subprocess) that this 8-device test process loads."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    out = str(tmp_path / "dp_cli_art")
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": "",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=8"}
    r = subprocess.run(
        [sys.executable, "tools/export_artifact.py", "--random", "--vgg",
         "tiny", "--out", out, "--batch", "8", "--frame_hw", "12x16",
         "--data_parallel", "--verify"],
        capture_output=True, text=True, timeout=600, cwd=REPO, env=env,
    )
    assert r.returncode == 0, r.stderr
    assert "verify ok" in r.stdout
    with open(os.path.join(out, "manifest.json")) as f:
        m = json.load(f)
    assert m["mesh"] is not None and int(np.prod(m["mesh"]["shape"])) == 8
    dec = ExportedDecoder(out)
    raw = {s["name"]: np.zeros(s["shape"], s["dtype"])
           for s in dec.manifest["raw_inputs"]}
    _, picks = dec.decode_raw(raw)
    assert picks.shape[0] == 8


def test_wrong_length_pspecs_fail_at_load(artifact, tmp_path, rng):
    """A manifest whose weight_pspecs length disagrees with the leaf count
    fails at load (zip truncation would half-place the weights)."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    _, summ = artifact
    cfg_tp = dataclasses.replace(
        summ.cfg, mesh=MeshConfig(num_data=4, num_model=2, tp_vgg=True)
    )
    tp = Summarizer.init_random(cfg_tp, seed=3, vgg_spec=TINY_SPEC,
                                data_parallel=True, serve_batch_size=8)
    out = str(tmp_path / "bad_pspecs_art")
    export_summarizer(tp, out, batch_size=8, frame_hw=(12, 16))
    mpath = os.path.join(out, "manifest.json")
    with open(mpath) as f:
        m = json.load(f)
    m["weight_pspecs"] = m["weight_pspecs"][:-2]
    with open(mpath, "w") as f:
        json.dump(m, f)
    # keep the sha check out of the way: it guards weights/program bytes,
    # not the manifest itself
    with pytest.raises(ValueError, match="weight_pspecs"):
        ExportedDecoder(out)


def test_corrupted_weights_fail_at_load(artifact, tmp_path):
    """A flipped byte in weights.npz (or a program/weights mix-up) fails at
    load with the checksum error — never silently wrong summaries."""
    import shutil

    out, _ = artifact
    bad = tmp_path / "bad_art"
    shutil.copytree(out, bad)
    p = bad / "weights.npz"
    blob = bytearray(p.read_bytes())
    blob[len(blob) // 2] ^= 0xFF
    p.write_bytes(bytes(blob))
    with pytest.raises(ValueError, match="sha256"):
        ExportedDecoder(str(bad))


def test_manifest_contents(artifact):
    out, summ = artifact
    with open(os.path.join(out, "manifest.json")) as f:
        m = json.load(f)
    assert m["batch_size"] == 2 and m["frame_hw"] == [12, 16]
    assert m["platforms"] == ["cpu"]
    assert {s["name"] for s in m["raw_inputs"]} == {
        "text_ids", "word_mask", "sent_mask", "frames", "img_mask",
        "waveform", "aud_mask",
    }
    assert m["n_weight_leaves"] == len(m["weight_dtypes"]) > 0


def test_cross_platform_tpu_export(artifact, tmp_path):
    """A CPU process can lower + serialize FOR TPU (deploy-from-dev-box):
    the artifact records the target platform and refuses to run on CPU."""
    _, summ = artifact
    out = str(tmp_path / "tpu_art")
    export_summarizer(summ, out, batch_size=1, frame_hw=(12, 16),
                      platforms=("tpu",))
    with open(os.path.join(out, "manifest.json")) as f:
        assert json.load(f)["platforms"] == ["tpu"]
    dec = ExportedDecoder(out)  # deserializes fine on any host
    raw = random_raw(summ.cfg, np.random.default_rng(0), 1, (12, 16))
    with pytest.raises(Exception, match="(?i)platform"):
        dec.decode_raw(raw)  # wrong backend must be loud, not wrong


def test_data_parallel_export_matches_single_device(artifact, tmp_path, rng):
    """A data_parallel Summarizer exports the GSPMD-sharded program; the
    reloaded artifact (8-device mesh) reproduces the single-device picks."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    out_single, summ = artifact
    dp = Summarizer.init_random(summ.cfg, seed=3, vgg_spec=TINY_SPEC,
                                data_parallel=True, serve_batch_size=8)
    out = str(tmp_path / "dp_art")
    export_summarizer(dp, out, batch_size=8, frame_hw=(12, 16))
    with open(os.path.join(out, "manifest.json")) as f:
        m = json.load(f)
    assert m["mesh"] is not None and int(np.prod(m["mesh"]["shape"])) == 8

    dec = ExportedDecoder(out)
    raw = random_raw(summ.cfg, rng, batch=8, frame_hw=(12, 16))
    _, picks = dec.decode_raw(raw)
    _, single = summ._decode(
        summ.params, summ.fe_params, {k: jnp.asarray(v) for k, v in raw.items()}
    )
    np.testing.assert_array_equal(picks, np.asarray(single))

    with pytest.raises(ValueError, match="multiple"):
        export_summarizer(dp, str(tmp_path / "x"), batch_size=3,
                          frame_hw=(12, 16))


def test_tp_vgg_export_matches_single_device(artifact, tmp_path, rng):
    """A DP × TP (MeshConfig.tp_vgg) Summarizer exports with per-leaf
    PartitionSpecs: the reloaded artifact keeps the VGG classifier sharded
    over 'model' and reproduces the single-device picks."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    _, summ = artifact
    cfg_tp = dataclasses.replace(
        summ.cfg, mesh=MeshConfig(num_data=4, num_model=2, tp_vgg=True)
    )
    tp = Summarizer.init_random(cfg_tp, seed=3, vgg_spec=TINY_SPEC,
                                data_parallel=True, serve_batch_size=8)
    out = str(tmp_path / "tp_art")
    export_summarizer(tp, out, batch_size=8, frame_hw=(12, 16))
    with open(os.path.join(out, "manifest.json")) as f:
        m = json.load(f)
    assert m["mesh"]["axis_names"] == ["data", "model"]
    assert m["mesh"]["batch_axes"] == ["data"]
    # TP-sharded weights bump the format so a pre-TP loader refuses loudly
    assert m["format_version"] == 2
    pspecs = m["weight_pspecs"]
    assert pspecs is not None
    sharded = [ps for ps in pspecs if any(e is not None for e in ps)]
    assert len(sharded) == 3  # fc1_w (col), fc1_b, fc2_w (row)

    dec = ExportedDecoder(out)
    n_sharded = sum(
        0 if w.sharding.is_fully_replicated else 1 for w in dec._weights
    )
    assert n_sharded == 3
    raw = random_raw(summ.cfg, rng, batch=8, frame_hw=(12, 16))
    _, picks = dec.decode_raw(raw)
    _, single = summ._decode(
        summ.params, summ.fe_params, {k: jnp.asarray(v) for k, v in raw.items()}
    )
    np.testing.assert_array_equal(picks, np.asarray(single))


def test_tp_only_export_replicates_indivisible_batch(artifact, tmp_path, rng):
    """A TP-only (no data_parallel) Summarizer with B=1 exports a program
    whose batch replicates over the mesh (1 % num_data != 0 must not fail)
    and still matches single-device picks."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    _, summ = artifact
    cfg_tp = dataclasses.replace(
        summ.cfg, mesh=MeshConfig(num_data=4, num_model=2, tp_vgg=True)
    )
    tp = Summarizer.init_random(cfg_tp, seed=3, vgg_spec=TINY_SPEC)
    out = str(tmp_path / "tp_b1_art")
    export_summarizer(tp, out, batch_size=1, frame_hw=(12, 16))
    with open(os.path.join(out, "manifest.json")) as f:
        m = json.load(f)
    assert m["mesh"]["batch_axes"] == []  # replicated batch

    dec = ExportedDecoder(out)
    raw = random_raw(summ.cfg, rng, batch=1, frame_hw=(12, 16))
    _, picks = dec.decode_raw(raw)
    _, single = summ._decode(
        summ.params, summ.fe_params, {k: jnp.asarray(v) for k, v in raw.items()}
    )
    np.testing.assert_array_equal(picks, np.asarray(single))


def test_serve_daemon_tp_artifact(artifact, tmp_path, rng):
    """The full TP deployment chain: export a DP × TP artifact, serve it
    through the HTTP daemon (ExportedSummarizer pads the request to the
    pinned batch), and get the same summary as plain single-device
    serving."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    import http.client
    import sys
    import threading

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from serve import serve

    _, summ = artifact
    cfg_tp = dataclasses.replace(
        summ.cfg, mesh=MeshConfig(num_data=4, num_model=2, tp_vgg=True)
    )
    tp = Summarizer.init_random(cfg_tp, seed=3, vgg_spec=TINY_SPEC,
                                data_parallel=True, serve_batch_size=8)
    out = str(tmp_path / "tp_daemon_art")
    export_summarizer(tp, out, batch_size=8, frame_hw=(12, 16))
    art = ExportedSummarizer(out)
    srv = serve(art, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        dirs = make_video_dirs(tmp_path, summ.cfg, rng, 1)
        conn = http.client.HTTPConnection(
            "127.0.0.1", srv.server_address[1], timeout=300)
        conn.request("POST", "/summarize",
                     body=json.dumps({"video_dir": dirs[0]}))
        resp = conn.getresponse()
        body = json.loads(resp.read() or b"{}")
        conn.close()
        assert resp.status == 200
        assert body["summary"] == summ.summarize(dirs[0])
        # /healthz surfaces the artifact's mesh layout for ops
        conn = http.client.HTTPConnection(
            "127.0.0.1", srv.server_address[1], timeout=60)
        conn.request("GET", "/healthz")
        health = json.loads(conn.getresponse().read())
        conn.close()
        assert health["parallelism"]["mesh_axes"] == {"data": 4, "model": 2}
        assert health["parallelism"]["artifact_format"] == 2
    finally:
        srv.shutdown()
        srv.server_close()


def test_data_parallel_artifact_fresh_process(artifact, tmp_path, rng):
    """The DP artifact loads in a fresh 8-device process (no model code)
    and errors clearly on a host with too few devices."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    _, summ = artifact
    dp = Summarizer.init_random(summ.cfg, seed=3, vgg_spec=TINY_SPEC,
                                data_parallel=True, serve_batch_size=8)
    out = str(tmp_path / "dp_art")
    export_summarizer(dp, out, batch_size=8, frame_hw=(12, 16))
    raw = random_raw(summ.cfg, rng, batch=8, frame_hw=(12, 16))
    np.savez(tmp_path / "raw.npz", **raw)
    want_lp, want_picks = ExportedDecoder(out).decode_raw(raw)

    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": ""}
    code_8dev = (
        "import sys, numpy as np, jax\n"
        "jax.config.update('jax_num_cpu_devices', 8)\n"
        f"sys.path.insert(0, {REPO!r})\n"
        "from mmbidaf_tpu.export import ExportedDecoder\n"
        f"raw = dict(np.load({str(tmp_path / 'raw.npz')!r}))\n"
        f"log_p, picks = ExportedDecoder({out!r}).decode_raw(raw)\n"
        f"np.savez({str(tmp_path / 'out.npz')!r}, log_p=log_p, picks=picks)\n"
    )
    subprocess.run([sys.executable, "-c", code_8dev], check=True, env=env,
                   timeout=300, cwd=REPO)
    got = np.load(tmp_path / "out.npz")
    np.testing.assert_array_equal(got["picks"], want_picks)
    np.testing.assert_array_equal(got["log_p"], want_lp)

    code_1dev = (
        "import sys, jax\n"
        "jax.config.update('jax_num_cpu_devices', 1)\n"
        f"sys.path.insert(0, {REPO!r})\n"
        "from mmbidaf_tpu.export import ExportedDecoder\n"
        f"ExportedDecoder({out!r})\n"
    )
    r = subprocess.run([sys.executable, "-c", code_1dev], env=env,
                       capture_output=True, text=True, timeout=300, cwd=REPO)
    assert r.returncode != 0
    assert "this host has 1" in r.stderr


def test_dynamic_batcher_over_artifact(artifact, tmp_path, rng):
    """DynamicBatcher coalesces concurrent requests over an AOT artifact
    (duck-typed _raw_row/_decode_batch): results == the sequential path;
    a max_batch_size other than the artifact's pinned batch errors."""
    from concurrent.futures import ThreadPoolExecutor

    from mmbidaf_tpu.serving import DynamicBatcher

    out, summ = artifact
    art = ExportedSummarizer(out)
    dirs = make_video_dirs(tmp_path, summ.cfg, rng, 3)
    want = art.summarize_batch(dirs)

    with pytest.raises(ValueError, match="fixed batch"):
        DynamicBatcher(art, max_batch_size=4)

    with DynamicBatcher(art, max_batch_size=2, max_wait_ms=50.0) as b:
        with ThreadPoolExecutor(max_workers=3) as ex:
            got = list(ex.map(b.submit, dirs))
    assert got == want
    assert b.stats["requests"] == 3 and b.stats["batches"] >= 2


def test_serve_cli_artifact_flag_conflicts(artifact):
    """--artifact pins mode/batch/sharding: conflicting flags error at parse
    time (exit 2), before any model or device work."""
    out, _ = artifact
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": ""}
    # NB --long is NOT a conflict: ExportedSummarizer.summarize_long
    # windows through the frozen program (test_serve_daemon_artifact_long)
    for extra in (["--mode", "beam"], ["--data_parallel"],
                  ["--serve_batch_size", "2"]):
        r = subprocess.run(
            [sys.executable, "tools/serve.py", "--artifact", out, *extra],
            capture_output=True, text=True, timeout=120, cwd=REPO, env=env,
        )
        assert r.returncode == 2, (extra, r.stderr)
        assert "fixed at export time" in r.stderr


@pytest.mark.slow
def test_export_cli_from_trained_run(tmp_path):
    """The documented deployment flow end-to-end: train.py on a real
    (synthetic) corpus → export_artifact.py --run_dir --verify → the
    artifact summarizes a corpus video identically to Summarizer.from_run."""
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": ""}
    corpus = str(tmp_path / "corpus")
    r = subprocess.run(
        [sys.executable, "examples/make_synthetic_corpus.py", "--out", corpus,
         "--videos", "3", "--sentences", "6", "--frames", "3",
         "--seconds", "1.0"],
        capture_output=True, text=True, timeout=300, cwd=REPO, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    r = subprocess.run(
        [sys.executable, "train.py", "--data_dir", corpus, "--vgg", "tiny",
         "--config_json", "examples/tiny_config.json", "--num_steps", "4",
         "--eval_steps", "100", "--save_dir", str(tmp_path)],
        capture_output=True, text=True, timeout=900, cwd=REPO, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    run_dir = str(tmp_path / "mmbidaf")
    out = str(tmp_path / "artifact")
    r = subprocess.run(
        [sys.executable, "tools/export_artifact.py", "--run_dir", run_dir,
         "--out", out, "--batch", "1", "--frame_hw", "48x64", "--verify"],
        capture_output=True, text=True, timeout=900, cwd=REPO, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "verify ok" in r.stdout

    from mmbidaf_tpu.serving import Summarizer

    video = os.path.join(corpus, sorted(os.listdir(corpus))[0])
    got = ExportedSummarizer(out).summarize(video)
    want = Summarizer.from_run(run_dir).summarize(video)
    assert got == want and isinstance(got, str) and got


def test_export_cli_random_verify(tmp_path):
    """tools/export_artifact.py --random --vgg tiny --verify round-trips."""
    out = str(tmp_path / "art")
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": ""}
    r = subprocess.run(
        [sys.executable, "tools/export_artifact.py", "--random", "--vgg",
         "tiny", "--out", out, "--batch", "1", "--frame_hw", "12x16",
         "--verify"],
        capture_output=True, text=True, timeout=600, cwd=REPO, env=env,
    )
    assert r.returncode == 0, r.stderr
    assert "verify ok" in r.stdout
    assert os.path.exists(os.path.join(out, "decode.jaxexport"))


@pytest.fixture(scope="module")
def beam_artifact(tmp_path_factory):
    """A beam-search artifact (width 3) over the same tiny config."""
    cfg = make_cfg()
    summ = Summarizer.init_random(cfg, seed=3, vgg_spec=TINY_SPEC,
                                  mode="beam", topk=3)
    out = str(tmp_path_factory.mktemp("beam_artifact"))
    export_summarizer(summ, out, batch_size=2, frame_hw=(12, 16))
    return out, summ


def test_beam_export_roundtrip_parity(beam_artifact, rng):
    """Beam search is deterministic → exportable: the frozen program
    reproduces the live beam decode exactly (picks AND the best beam's
    total sequence log-prob), and the manifest records mode + width."""
    out, summ = beam_artifact
    dec = ExportedDecoder(out)
    assert dec.decode_mode == "beam"
    assert dec.manifest["beam_width"] == 3
    raw = random_raw(summ.cfg, rng, batch=2, frame_hw=(12, 16))
    log_p, picks = dec.decode_raw(raw)
    live_lp, live_picks = summ._decode(
        summ.params, summ.fe_params, {k: jnp.asarray(v) for k, v in raw.items()}
    )
    assert log_p.shape == (2,)  # total seq log-prob, not per-step [B,K,T]
    np.testing.assert_array_equal(picks, np.asarray(live_picks))
    np.testing.assert_allclose(log_p, np.asarray(live_lp), rtol=0, atol=0)


def test_beam_exported_summarizer_matches_live(beam_artifact, tmp_path, rng):
    """End-to-end video dirs through a beam artifact == live beam serving
    (incl. the pad-to-static-batch tail: 3 requests over batch 2)."""
    out, summ = beam_artifact
    dirs = make_video_dirs(tmp_path, summ.cfg, rng, 3)
    got = ExportedSummarizer(out).summarize_batch(dirs)
    want = summ.summarize_batch(dirs)
    assert got == want
    assert all(isinstance(s, str) and s for s in got)


def test_greedy_manifest_decode_mode(artifact):
    out, _ = artifact
    with open(os.path.join(out, "manifest.json")) as f:
        m = json.load(f)
    assert m["decode_mode"] == "greedy" and m["beam_width"] is None


def test_pre_beam_manifest_defaults_greedy(artifact, tmp_path):
    """Artifacts written before decode_mode existed load as greedy."""
    import shutil

    out, _ = artifact
    old = str(tmp_path / "old_art")
    shutil.copytree(out, old)
    mp = os.path.join(old, "manifest.json")
    with open(mp) as f:
        m = json.load(f)
    del m["decode_mode"], m["beam_width"]
    # the manifest hash covers weights/program, not itself — safe to edit
    with open(mp, "w") as f:
        json.dump(m, f)
    assert ExportedDecoder(old).decode_mode == "greedy"


def test_export_cli_beam_verify(tmp_path):
    """tools/export_artifact.py --mode beam --verify round-trips."""
    out = str(tmp_path / "art")
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": ""}
    r = subprocess.run(
        [sys.executable, "tools/export_artifact.py", "--random", "--vgg",
         "tiny", "--out", out, "--batch", "1", "--frame_hw", "12x16",
         "--mode", "beam", "--topk", "2", "--verify"],
        capture_output=True, text=True, timeout=600, cwd=REPO, env=env,
    )
    assert r.returncode == 0, r.stderr
    assert "verify ok" in r.stdout and "mode=beam" in r.stdout
    with open(os.path.join(out, "manifest.json")) as f:
        m = json.load(f)
    assert m["decode_mode"] == "beam" and m["beam_width"] == 2


def make_long_video(tmp_path, cfg, rng, n_sents=20, frame_hw=(12, 16)):
    """One video whose transcript (20 sents) overflows max_sentences=7."""
    from PIL import Image

    d = cfg.data
    n_samples = d.max_audio_frames * d.hop_length + d.win_length
    h, w_ = frame_hw
    vd = tmp_path / "longvid"
    (vd / "frames").mkdir(parents=True)
    for i in range(4):
        arr = (rng.random((h, w_, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(vd / "frames" / f"f{i}.png")
    sig = (rng.standard_normal(n_samples // 3) * 8000).astype(np.int16)
    with wave_mod.open(str(vd / "audio.wav"), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(d.sample_rate)
        w.writeframes(sig.tobytes())
    sents = [f"Long video sentence {j} covers topic {j}." for j in range(n_sents)]
    (vd / "transcript.txt").write_text(" ".join(sents))
    return str(vd), sents


def test_exported_summarize_long_matches_live(artifact, tmp_path, rng):
    """Windowed long-transcript serving over the frozen program == live
    Summarizer.summarize_long (the artifact re-ships raw media per window
    instead of featurizing once — same math, same merged picks)."""
    out, summ = artifact
    vd, sents = make_long_video(tmp_path, summ.cfg, rng)
    got = ExportedSummarizer(out).summarize_long(vd)
    want = summ.summarize_long(vd)
    assert got == want
    picked = [x.strip() + "." for x in got.split(".") if x.strip()]
    assert all(p in sents for p in picked), picked


def test_beam_artifact_summarize_long(beam_artifact, tmp_path, rng):
    """Beam artifacts window too: the [B] total-sequence log-prob is the
    window merge key (picks_scores broadcast), matching live beam."""
    out, summ = beam_artifact
    vd, sents = make_long_video(tmp_path, summ.cfg, rng)
    got = ExportedSummarizer(out).summarize_long(vd)
    assert got == summ.summarize_long(vd)
    picked = [x.strip() + "." for x in got.split(".") if x.strip()]
    assert all(p in sents for p in picked), picked


def test_exported_summarize_long_short_transcript(artifact, tmp_path, rng):
    """Short transcripts fall back to a single-window decode that matches
    plain artifact serving."""
    out, summ = artifact
    dirs = make_video_dirs(tmp_path, summ.cfg, rng, 1)
    es = ExportedSummarizer(out)
    assert es.summarize_long(dirs[0]) == es.summarize(dirs[0])


def test_serve_daemon_artifact_long(artifact, tmp_path, rng):
    """The daemon's --long windowed path works over an artifact (the gate
    that refused --long with --artifact is gone): HTTP response matches
    ExportedSummarizer.summarize_long, and /healthz reports the frozen
    decode mode."""
    import http.client
    import sys
    import threading

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from serve import serve

    out, summ = artifact
    art = ExportedSummarizer(out)
    vd, _ = make_long_video(tmp_path, summ.cfg, rng)
    srv = serve(art, port=0, use_long=True)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection(
            "127.0.0.1", srv.server_address[1], timeout=300)
        conn.request("POST", "/summarize", body=json.dumps({"video_dir": vd}))
        resp = conn.getresponse()
        got = json.loads(resp.read())
        assert resp.status == 200
        assert got["summary"] == art.summarize_long(vd)
        conn.request("GET", "/healthz")
        resp = conn.getresponse()
        hz = json.loads(resp.read())
        conn.close()
        assert hz["decode_mode"] == "greedy"
    finally:
        srv.shutdown()
        srv.server_close()


def test_beam_data_parallel_export_matches_single_device(beam_artifact,
                                                         tmp_path, rng):
    """Beam export composes with data-parallel export: the GSPMD-sharded
    beam program reloaded on the 8-device mesh reproduces the
    single-device beam picks and sequence log-probs."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    _, summ = beam_artifact  # single-device beam (seed 3, width 3)
    dp = Summarizer.init_random(summ.cfg, seed=3, vgg_spec=TINY_SPEC,
                                mode="beam", topk=3,
                                data_parallel=True, serve_batch_size=8)
    out = str(tmp_path / "beam_dp_art")
    export_summarizer(dp, out, batch_size=8, frame_hw=(12, 16))
    dec = ExportedDecoder(out)
    assert dec.decode_mode == "beam"
    assert dec.manifest["mesh"] is not None

    raw = random_raw(summ.cfg, rng, batch=8, frame_hw=(12, 16))
    log_p, picks = dec.decode_raw(raw)
    single_lp, single = summ._decode(
        summ.params, summ.fe_params, {k: jnp.asarray(v) for k, v in raw.items()}
    )
    np.testing.assert_array_equal(picks, np.asarray(single))
    np.testing.assert_allclose(log_p, np.asarray(single_lp), atol=2e-5)
