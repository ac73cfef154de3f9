"""Adversarial serving-surface tests (round-3 review item 7): empty and
single-sentence transcripts, corrupt PNG/WAV assets through the native
batch decode path, and a shared Summarizer under concurrent threads with a
poisoned request in the mix. The contract: bad assets fail with a clean
Python exception (never a hang or a crash), and the Summarizer stays
usable afterwards."""

import dataclasses
import os
import wave as wave_mod
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pytest

from mmbidaf_tpu.config import tiny_test_config
from mmbidaf_tpu.ops.vgg import TINY_SPEC
from mmbidaf_tpu.serving import Summarizer


def _cfg():
    cfg = tiny_test_config()
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, img_feat_dim=32, audio_feat_dim=cfg.data.n_mfcc
        ),
    )


def _write_video(vd, rng, cfg, sentences, n_frames=2, wav_bytes=None,
                 png_blobs=None):
    from PIL import Image

    d = cfg.data
    vd.mkdir(parents=True, exist_ok=True)
    if png_blobs is None:
        (vd / "frames").mkdir(exist_ok=True)
        for i in range(n_frames):
            arr = (rng.random((10, 12, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(vd / "frames" / f"f{i}.png")
    else:
        (vd / "frames").mkdir(exist_ok=True)
        for i, blob in enumerate(png_blobs):
            (vd / "frames" / f"f{i}.png").write_bytes(blob)
    if wav_bytes is None:
        n_samples = d.max_audio_frames * d.hop_length + d.win_length
        sig = (rng.standard_normal(n_samples // 3) * 8000).astype(np.int16)
        with wave_mod.open(str(vd / "audio.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(d.sample_rate)
            w.writeframes(sig.tobytes())
    else:
        (vd / "audio.wav").write_bytes(wav_bytes)
    (vd / "transcript.txt").write_text(" ".join(sentences))
    return str(vd)


@pytest.fixture(scope="module")
def summarizer():
    return Summarizer.init_random(_cfg(), seed=0, vgg_spec=TINY_SPEC)


def test_empty_transcript_returns_empty_summary(tmp_path, rng, summarizer):
    vd = _write_video(tmp_path / "empty", rng, _cfg(), [])
    out = summarizer.summarize(vd)
    assert out == ""  # nothing to pick from; no crash, no placeholder junk


def test_single_sentence_video(tmp_path, rng, summarizer):
    vd = _write_video(tmp_path / "single", rng, _cfg(),
                      ["Only one sentence exists here."])
    out = summarizer.summarize(vd)
    assert out == "Only one sentence exists here."
    # summarize_long must take the short-transcript fallback, same answer
    assert summarizer.summarize_long(vd) == out


def test_whitespace_transcript(tmp_path, rng, summarizer):
    vd = _write_video(tmp_path / "ws", rng, _cfg(), ["   \n\t  "])
    assert summarizer.summarize(vd) == ""


def test_corrupt_png_raises_cleanly(tmp_path, rng, summarizer):
    vd = _write_video(
        tmp_path / "badpng", rng, _cfg(), ["A sentence."],
        png_blobs=[b"\x89PNG\r\n\x1a\n" + bytes(rng.integers(0, 256, 64,
                                                             dtype=np.uint8))],
    )
    with pytest.raises(Exception) as ei:
        summarizer.summarize(vd)
    assert not isinstance(ei.value, (SystemExit, KeyboardInterrupt))
    # the Summarizer is not poisoned by the failed request
    good = _write_video(tmp_path / "good_after_png", rng, _cfg(),
                        ["Recovery sentence works."])
    assert "Recovery" in summarizer.summarize(good)


def test_corrupt_wav_raises_cleanly(tmp_path, rng, summarizer):
    vd = _write_video(
        tmp_path / "badwav", rng, _cfg(), ["A sentence."],
        wav_bytes=b"RIFFxxxxWAVEfmt " + bytes(rng.integers(0, 256, 32,
                                                           dtype=np.uint8)),
    )
    with pytest.raises(Exception) as ei:
        summarizer.summarize(vd)
    assert not isinstance(ei.value, (SystemExit, KeyboardInterrupt))


def test_threaded_serving_with_poisoned_request(tmp_path, rng):
    """One corrupt video among concurrent requests: the bad request raises
    in ITS thread only; every good request completes with the same answer
    it gets serially (the Summarizer is share-safe — serving.py holds the
    topk rng behind a lock; greedy/beam are stateless)."""
    cfg = _cfg()
    s = Summarizer.init_random(cfg, seed=1, vgg_spec=TINY_SPEC)
    good = [
        _write_video(tmp_path / f"g{i}", rng, cfg,
                     [f"Good video {i} sentence one.",
                      f"Good video {i} sentence two."])
        for i in range(4)
    ]
    bad = _write_video(tmp_path / "poison", rng, cfg, ["Bad."],
                       png_blobs=[b"not a png at all"])
    serial = [s.summarize(v) for v in good]

    def req(v):
        return s.summarize(v)

    with ThreadPoolExecutor(max_workers=5) as ex:
        futs = {v: ex.submit(req, v) for v in (*good, bad)}
    for v in good:
        assert futs[v].result() == serial[good.index(v)]
    with pytest.raises(Exception):
        futs[bad].result()


# ---- the same adversarial surface over AOT artifacts -----------------------
# (ExportedSummarizer shares host_raw_row with live serving, but routes
# decodes through the frozen program and its own windowing — the edge
# cases must behave identically there.)


@pytest.fixture(scope="module")
def artifact_summarizer(tmp_path_factory):
    from mmbidaf_tpu.export import ExportedSummarizer, export_summarizer

    summ = Summarizer.init_random(_cfg(), seed=0, vgg_spec=TINY_SPEC)
    out = str(tmp_path_factory.mktemp("robust_art"))
    export_summarizer(summ, out, batch_size=1, frame_hw=(10, 12))
    return ExportedSummarizer(out)


def test_artifact_empty_transcript(tmp_path, rng, artifact_summarizer):
    vd = _write_video(tmp_path / "a_empty", rng, _cfg(), [])
    assert artifact_summarizer.summarize(vd) == ""
    assert artifact_summarizer.summarize_long(vd) == ""


def test_artifact_single_sentence(tmp_path, rng, artifact_summarizer):
    vd = _write_video(tmp_path / "a_single", rng, _cfg(),
                      ["Only one sentence exists here."])
    out = artifact_summarizer.summarize(vd)
    assert out == "Only one sentence exists here."
    assert artifact_summarizer.summarize_long(vd) == out


def test_artifact_corrupt_assets_fail_cleanly(tmp_path, rng, artifact_summarizer):
    """Bad assets fail the request with a clean exception (never a crash),
    and the artifact stays usable afterwards — through summarize AND the
    windowed summarize_long path."""
    bad_png = _write_video(
        tmp_path / "a_badpng", rng, _cfg(), ["A sentence."],
        png_blobs=[b"\x89PNG\r\n\x1a\n" + bytes(rng.integers(0, 256, 64,
                                                             dtype=np.uint8))],
    )
    bad_wav = _write_video(
        tmp_path / "a_badwav", rng, _cfg(), ["A sentence."],
        wav_bytes=b"RIFFxxxxWAVEfmt " + bytes(rng.integers(0, 256, 32,
                                                           dtype=np.uint8)),
    )
    for vd in (bad_png, bad_wav):
        for call in (artifact_summarizer.summarize,
                     artifact_summarizer.summarize_long):
            with pytest.raises(Exception) as ei:
                call(vd)
            assert not isinstance(ei.value, (SystemExit, KeyboardInterrupt))
    good = _write_video(tmp_path / "a_recover", rng, _cfg(),
                        ["Recovery sentence works."])
    assert "Recovery" in artifact_summarizer.summarize(good)
