"""Serving API: video dirs in → summary strings out, greedy and top-k."""

import dataclasses
import os
import wave as wave_mod

import numpy as np
import pytest

from mmbidaf_tpu.config import tiny_test_config
from mmbidaf_tpu.ops.vgg import TINY_SPEC
from mmbidaf_tpu.serving import Summarizer


@pytest.fixture
def corpus_dirs(tmp_path, rng):
    from PIL import Image

    cfg = tiny_test_config()
    d = cfg.data
    n_samples = d.max_audio_frames * d.hop_length + d.win_length
    dirs = []
    for v in range(2):
        vd = tmp_path / f"vid{v}"
        (vd / "frames").mkdir(parents=True)
        for i in range(4):
            arr = (rng.random((12, 16, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(vd / "frames" / f"f{i}.png")
        sig = (rng.standard_normal(n_samples // 3) * 8000).astype(np.int16)
        with wave_mod.open(str(vd / "audio.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(d.sample_rate)
            w.writeframes(sig.tobytes())
        sents = [f"Video {v} sentence {j} covers topic {j}." for j in range(5)]
        (vd / "transcript.txt").write_text(" ".join(sents))
        dirs.append(str(vd))
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, img_feat_dim=32, audio_feat_dim=cfg.data.n_mfcc)
    )
    return dirs, cfg


def test_summarize_greedy(corpus_dirs):
    dirs, cfg = corpus_dirs
    s = Summarizer.init_random(cfg, seed=0, vgg_spec=TINY_SPEC)
    # vocab is synthetic; transcripts map to OOV — still must produce summaries
    outs = s.summarize_batch(dirs)
    assert len(outs) == 2
    for out in outs:
        assert isinstance(out, str) and len(out) > 0
        assert "sentence" in out  # assembled from real transcript sentences


def test_summarize_static_serve_batch(corpus_dirs):
    """serve_batch_size pads+chunks requests to ONE static shape: results
    match the dynamic path for any request size (1, 2, 3 over batch 2)."""
    dirs, cfg = corpus_dirs
    dyn = Summarizer.init_random(cfg, seed=0, vgg_spec=TINY_SPEC)
    stat = Summarizer.init_random(cfg, seed=0, vgg_spec=TINY_SPEC, serve_batch_size=2)
    for req in ([dirs[0]], dirs, [dirs[0], dirs[1], dirs[0]]):
        assert stat.summarize_batch(req) == dyn.summarize_batch(req)


def test_summarize_topk(corpus_dirs):
    dirs, cfg = corpus_dirs
    s = Summarizer.init_random(cfg, seed=0, vgg_spec=TINY_SPEC, mode="topk", topk=3)
    out1 = s.summarize(dirs[0])
    out2 = s.summarize(dirs[0])
    assert isinstance(out1, str) and len(out1) > 0
    # stochastic decode: repeated calls may differ (not asserted strictly)


def test_summarize_from_torch_state_dict(corpus_dirs):
    import torch

    from tests.oracles import torch_model as oracle

    dirs, cfg = corpus_dirs
    torch.manual_seed(0)
    wv = torch.randn(cfg.data.vocab_size, cfg.model.emb_dim)
    tm = oracle.MMBiDAF(
        wv, cfg.model.hidden_size, img_feat_dim=cfg.model.img_feat_dim,
        audio_feat_dim=cfg.model.audio_feat_dim,
        num_decode_steps=cfg.model.max_decode_steps,
    )
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    w2i = {f"w{i}": i for i in range(cfg.data.vocab_size)}
    s = Summarizer.from_torch_state_dict(sd, w2i, cfg, vgg_spec=TINY_SPEC)
    out = s.summarize(dirs[0])
    assert isinstance(out, str) and len(out) > 0


# --------------------------------------------------- long-video windowing

def test_transcript_windows():
    from mmbidaf_tpu.serving import transcript_windows

    assert transcript_windows(5, 7, 3) == [0]          # fits one window
    assert transcript_windows(7, 7, 3) == [0]
    starts = transcript_windows(20, 7, 3)
    assert starts[0] == 0 and starts[-1] == 13         # tail window covers end
    # every sentence is inside at least one window
    covered = set()
    for s in starts:
        covered.update(range(s, s + 7))
    assert covered >= set(range(20))


def test_merge_window_picks():
    from mmbidaf_tpu.serving import merge_window_picks

    # two windows (starts 0 and 3, window len 5/4): window 0 picks local
    # 1, 4; window 1 picks local 1 (== global 4, duplicate, better score)
    # and local 3 (== padded slot, dropped)
    picks = np.array([[1, 4], [1, 3]])
    scores = np.array([[-1.0, -5.0], [-2.0, -0.1]])
    out = merge_window_picks(picks, scores, starts=[0, 3], window_lens=[5, 3], k=2)
    assert out == [1, 4]
    # k=1 keeps the single best-scoring global sentence
    out = merge_window_picks(picks, scores, starts=[0, 3], window_lens=[5, 3], k=1)
    assert out == [1]


@pytest.fixture
def long_video_dir(tmp_path, rng):
    from PIL import Image

    cfg = tiny_test_config()
    d = cfg.data
    n_samples = d.max_audio_frames * d.hop_length + d.win_length
    vd = tmp_path / "longvid"
    (vd / "frames").mkdir(parents=True)
    for i in range(4):
        arr = (rng.random((12, 16, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(vd / "frames" / f"f{i}.png")
    sig = (rng.standard_normal(n_samples // 3) * 8000).astype(np.int16)
    with wave_mod.open(str(vd / "audio.wav"), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(d.sample_rate)
        w.writeframes(sig.tobytes())
    # 20 sentences >> the max_sentences=7 bucket
    sents = [f"Long video sentence {j} covers topic {j}." for j in range(20)]
    (vd / "transcript.txt").write_text(" ".join(sents))
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, img_feat_dim=32,
                                       audio_feat_dim=cfg.data.n_mfcc)
    )
    return str(vd), sents, cfg


def test_summarize_long(long_video_dir):
    vd, sents, cfg = long_video_dir
    s = Summarizer.init_random(cfg, seed=0, vgg_spec=TINY_SPEC)
    out = s.summarize_long(vd)
    assert isinstance(out, str) and len(out) > 0
    # assembled strictly from real transcript sentences, in transcript order
    picked = [x.strip() + "." for x in out.split(".") if x.strip()]
    assert all(p in sents for p in picked), picked
    assert picked == sorted(picked, key=sents.index)
    assert len(picked) <= cfg.model.max_decode_steps


def test_summarize_long_static_batch_matches(long_video_dir):
    """serve_batch_size chunking gives the same result as one dynamic batch."""
    vd, _, cfg = long_video_dir
    dyn = Summarizer.init_random(cfg, seed=0, vgg_spec=TINY_SPEC)
    stat = Summarizer.init_random(cfg, seed=0, vgg_spec=TINY_SPEC, serve_batch_size=2)
    assert dyn.summarize_long(vd) == stat.summarize_long(vd)


def test_summarize_long_short_transcript_falls_back(corpus_dirs):
    dirs, cfg = corpus_dirs
    s = Summarizer.init_random(cfg, seed=0, vgg_spec=TINY_SPEC)
    assert s.summarize_long(dirs[0]) == s.summarize(dirs[0])


def test_summarize_long_beam_mode(long_video_dir):
    """Beam decode returns a 1-D sequence log-prob; summarize_long must
    broadcast it as the window merge key instead of crashing."""
    vd, sents, cfg = long_video_dir
    s = Summarizer.init_random(cfg, seed=0, vgg_spec=TINY_SPEC, mode="beam", topk=2)
    out = s.summarize_long(vd)
    assert isinstance(out, str) and len(out) > 0
    picked = [x.strip() + "." for x in out.split(".") if x.strip()]
    assert all(p in sents for p in picked), picked


def test_summarize_batch_empty_request():
    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, img_feat_dim=32,
                                       audio_feat_dim=cfg.data.n_mfcc)
    )
    s = Summarizer.init_random(cfg, seed=0, vgg_spec=TINY_SPEC, serve_batch_size=2)
    assert s.summarize_batch([]) == []


def test_summarize_empty_request(corpus_dirs):
    """[] in → [] out, on BOTH the dynamic and the static-batch path (the
    dynamic path used to IndexError on rows[0])."""
    _, cfg = corpus_dirs
    dyn = Summarizer.init_random(cfg, seed=0, vgg_spec=TINY_SPEC)
    stat = Summarizer.init_random(cfg, seed=0, vgg_spec=TINY_SPEC, serve_batch_size=2)
    assert dyn.summarize_batch([]) == []
    assert stat.summarize_batch([]) == []


def test_unknown_decode_mode_raises(corpus_dirs):
    """A mode typo must fail construction, not silently run stochastic
    top-k sampling."""
    _, cfg = corpus_dirs
    with pytest.raises(ValueError, match="greddy"):
        Summarizer.init_random(cfg, seed=0, vgg_spec=TINY_SPEC, mode="greddy")


def test_keyframe_policy_reaches_serving_decode(corpus_dirs, monkeypatch):
    """Summarizer must decode keyframes with the CONFIG's policy (a model
    trained on shot_change keyframes used to be served every_n frames)."""
    import mmbidaf_tpu.serving as serving_mod

    dirs, cfg = corpus_dirs
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, keyframe_policy="shot_change")
    )
    seen = []
    real = serving_mod.load_video_assets

    def spy(*args, **kwargs):
        seen.append(kwargs.get("keyframe_policy", "every_n"))
        return real(*args, **kwargs)

    monkeypatch.setattr(serving_mod, "load_video_assets", spy)
    s = Summarizer.init_random(cfg, seed=0, vgg_spec=TINY_SPEC)
    outs = s.summarize_batch([dirs[0]])
    assert len(outs) == 1
    assert seen == ["shot_change"]


def test_warmup_matches_cold(corpus_dirs):
    """warmup() compiles on a synthetic batch; it must not change what real
    requests return (greedy is deterministic, so equality is exact)."""
    dirs, cfg = corpus_dirs
    warm = Summarizer.init_random(cfg, seed=0, vgg_spec=TINY_SPEC,
                                  serve_batch_size=2)
    warm.warmup(frame_hw=(12, 16))
    cold = Summarizer.init_random(cfg, seed=0, vgg_spec=TINY_SPEC,
                                  serve_batch_size=2)
    assert warm.summarize_batch(dirs) == cold.summarize_batch(dirs)


def test_warmup_topk_preserves_rng_stream(corpus_dirs):
    """topk warmup decodes under a FIXED key — the serving rng stream is
    untouched, so warmed and cold summarizers sample identically."""
    dirs, cfg = corpus_dirs
    warm = Summarizer.init_random(cfg, seed=3, vgg_spec=TINY_SPEC,
                                  mode="topk", topk=3)
    warm.warmup(frame_hw=(12, 16))
    cold = Summarizer.init_random(cfg, seed=3, vgg_spec=TINY_SPEC,
                                  mode="topk", topk=3)
    assert warm.summarize_batch(dirs) == cold.summarize_batch(dirs)


def test_warmup_include_long(corpus_dirs):
    """include_long compiles the featurize + feature-shaped window decode;
    summarize_long afterwards matches a cold summarizer."""
    dirs, cfg = corpus_dirs
    warm = Summarizer.init_random(cfg, seed=0, vgg_spec=TINY_SPEC,
                                  serve_batch_size=2)
    warm.warmup(frame_hw=(12, 16), include_long=True)
    cold = Summarizer.init_random(cfg, seed=0, vgg_spec=TINY_SPEC,
                                  serve_batch_size=2)
    assert warm.summarize_long(dirs[0]) == cold.summarize_long(dirs[0])
