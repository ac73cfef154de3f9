"""C++ native decode runtime vs the Python reference paths (both must agree;
the native path is exercised only when the toolchain built the .so).
"""

import io
import wave as wave_mod

import numpy as np
import pytest

from mmbidaf_tpu.native import (
    native_available,
    pad_waveforms,
    ppm_decode,
    sample_keyframes_batch,
    wav_decode,
)
from mmbidaf_tpu.data.video import sample_keyframes


def _wav_bytes(sig_int16, sr=8000, channels=1):
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(sig_int16.tobytes())
    return buf.getvalue()


def test_native_builds():
    assert native_available(), "C++ native library failed to build/load"


def test_wav_decode_matches_python(rng):
    sig = (rng.standard_normal(5000) * 20000).astype(np.int16)
    data = _wav_bytes(sig)
    wave, sr = wav_decode(data)
    assert sr == 8000 and len(wave) == 5000
    np.testing.assert_allclose(wave, sig.astype(np.float32) / 32768.0, atol=1e-6)


def test_wav_decode_stereo_mix(rng):
    sig = (rng.standard_normal((3000, 2)) * 15000).astype(np.int16)
    data = _wav_bytes(sig.reshape(-1), channels=2)
    wave, sr = wav_decode(data)
    expected = (sig[:, 0].astype(np.float32) + sig[:, 1]) / 2 / 32768.0
    np.testing.assert_allclose(wave, expected, atol=1e-4)


def test_ppm_decode(rng):
    h, w = 7, 5
    pix = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    header = f"P6\n# comment\n{w} {h}\n255\n".encode()
    out = ppm_decode(header + pix.tobytes())
    np.testing.assert_array_equal(out, pix)


def test_pad_waveforms_matches_python(rng):
    waves = [rng.standard_normal(n).astype(np.float32) for n in (100, 50, 130)]
    out = pad_waveforms(waves, 120)
    assert out.shape == (3, 120)
    np.testing.assert_array_equal(out[0, :100], waves[0])
    assert out[1, 50:].sum() == 0
    np.testing.assert_array_equal(out[2], waves[2][:120])


def test_sample_keyframes_batch_matches_python(rng):
    videos = [
        (rng.random((t, 6, 4, 3)) * 255).astype(np.uint8) for t in (10, 3, 17)
    ]
    out, mask = sample_keyframes_batch(videos, 5)
    for b, v in enumerate(videos):
        ref, ref_mask = sample_keyframes(v, 5)
        np.testing.assert_array_equal(out[b], ref)
        np.testing.assert_array_equal(mask[b], ref_mask)
