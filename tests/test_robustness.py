"""Robustness: malformed media inputs fall back/err cleanly; orbax best-k
retention keeps the best checkpoints by metric (the CheckpointSaver
contract from the reference's util toolbox).
"""

import numpy as np
import pytest

from mmbidaf_tpu.native import loader as native_loader


def test_wav_decode_malformed_bytes_raises_cleanly():
    # native path returns -1 → Python fallback raises a wave error
    with pytest.raises(Exception):
        native_loader.wav_decode(b"not a wav file at all")


def test_ppm_decode_falls_back_to_pil_for_png(rng, tmp_path):
    from PIL import Image
    import io

    arr = (rng.random((5, 6, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    out = native_loader.ppm_decode(buf.getvalue())  # not a PPM → PIL fallback
    np.testing.assert_array_equal(out, arr)


def test_native_wav_truncated_data_chunk(rng):
    """A WAV whose data chunk claims more bytes than present: decode what's
    there, no overread."""
    import io
    import wave as wave_mod

    sig = (rng.standard_normal(1000) * 10000).astype(np.int16)
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(sig.tobytes())
    data = bytearray(buf.getvalue())
    truncated = bytes(data[:-100])  # chop 50 samples off the end
    if native_loader.native_available():
        wave_out, sr = native_loader.wav_decode(truncated)
        assert sr == 8000
        assert len(wave_out) == 950
        np.testing.assert_allclose(wave_out, sig[:950] / 32768.0, atol=1e-6)


def test_checkpoint_best_k_retention(tmp_path):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from mmbidaf_tpu.config import tiny_test_config
    from mmbidaf_tpu.data.synthetic import random_word_vectors
    from mmbidaf_tpu.models.mmbidaf import mmbidaf_init
    from mmbidaf_tpu.train import checkpoint as ckpt
    from mmbidaf_tpu.train.loop import TrainState, init_train_state

    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, optimizer="adam", lr=1e-3)
    )
    rng = np.random.default_rng(0)
    wv = random_word_vectors(rng, cfg.data.vocab_size, cfg.model.emb_dim)
    params = mmbidaf_init(jax.random.key(0), cfg, jnp.asarray(wv))
    state = init_train_state(jax.random.key(1), params, cfg)

    mgr = ckpt.make_manager(
        str(tmp_path / "ck"), max_checkpoints=2, metric_name="ROUGE-L", maximize=True
    )
    # save 4 checkpoints with varying metric; only the best 2 should remain
    scores = [0.1, 0.9, 0.3, 0.7]
    for i, score in enumerate(scores):
        state = TrainState(
            step=jnp.asarray(i + 1, jnp.int32),
            params=state.params,
            opt_state=state.opt_state,
            ema_params=state.ema_params,
            rng=state.rng,
        )
        ckpt.save(mgr, state, {"ROUGE-L": score})
    kept = sorted(mgr.all_steps())
    assert len(kept) <= 2
    assert 2 in kept  # the 0.9 checkpoint (step 2) survives


# ------------------------------------------------ parser fuzz (no crashes)

def test_subtitle_parser_fuzz(rng):
    """parse_cues/subtitles_to_transcript never raise on arbitrary text and
    always return well-formed results."""
    from mmbidaf_tpu.data.subtitles import parse_cues, subtitles_to_transcript

    corpus = [
        "", "\x00\x01\x02", "WEBVTT", "-->", "00:00:01,000 --> garbage",
        "1\n00:99:99,999 --> 00:00:00,000\nbackwards\n",
        "99:59:59.999 --> 99:59:59.999\n<i><b>nested tags",
        "﻿BOM line\n00:00:01.000 --> 00:00:02.000\nok\n",
    ]
    for _ in range(30):
        n = int(rng.integers(0, 12))
        chars = rng.integers(32, 127, size=int(rng.integers(0, 200)))
        corpus.append("".join(chr(c) for c in chars) + "\n" * n)
    for text_in in corpus:
        cues = parse_cues(text_in)
        assert isinstance(cues, list)
        for s, e, body in cues:
            assert isinstance(s, float) and isinstance(e, float)
            assert isinstance(body, str) and body
        out = subtitles_to_transcript(text_in)
        assert isinstance(out, str)


def test_tvsum_tsv_fuzz(tmp_path, rng):
    """load_tvsum_anno_tsv raises ValueError (not arbitrary exceptions) on
    malformed rows and parses blank-line-littered files."""
    import pytest as _pytest

    from mmbidaf_tpu.data import benchmarks

    ok = tmp_path / "ok.tsv"
    ok.write_text("\n\nv1\tcat\t1,2,3\n\nv1\tcat\t2,3,4\n\n")
    out = benchmarks.load_tvsum_anno_tsv(str(ok))
    assert list(out) == ["v1"] and out["v1"].shape == (3,)

    for i, bad in enumerate(["v1\tonly2", "v1\tcat\t", "v1\tcat\tx,y,z"]):
        p = tmp_path / f"bad{i}.tsv"
        p.write_text(bad + "\n")
        with _pytest.raises(ValueError):
            benchmarks.load_tvsum_anno_tsv(str(p))


def test_wav_decode_fuzz(rng):
    """Native wav_decode returns -1 (then the Python fallback raises a
    clean error) rather than crashing on truncated/garbage RIFF data."""
    import pytest as _pytest

    from mmbidaf_tpu.native import wav_decode

    garbage = [
        b"", b"RIFF", b"RIFF\x00\x00\x00\x00WAVE",
        b"RIFF" + bytes(40),  # no WAVE tag
        bytes(rng.integers(0, 256, size=100, dtype=np.uint8)),
    ]
    for data in garbage:
        with _pytest.raises(Exception):
            wav_decode(data)  # stdlib wave fallback raises on all of these
