"""Audio frontend tests (SURVEY.md §5 item 2): matmul-DFT vs numpy.fft,
mel filterbank invariants, DCT vs direct formula, end-to-end shapes.
"""

import numpy as np

import jax.numpy as jnp

from mmbidaf_tpu.ops import audio


def test_matmul_dft_equals_numpy_rfft(rng):
    n_fft = 128
    x = rng.standard_normal((4, n_fft)).astype(np.float32)
    cos_b, sin_b = audio.dft_basis(n_fft)
    re = x @ cos_b
    im = x @ sin_b
    ref = np.fft.rfft(x, axis=-1)
    np.testing.assert_allclose(re, ref.real, atol=1e-3)
    np.testing.assert_allclose(im, ref.imag, atol=1e-3)


def test_windowed_power_spectrum_vs_numpy(rng):
    n_fft, win = 64, 48
    consts = audio.make_audio_frontend_consts(16000, n_fft, win, 12, 8)
    frames = rng.standard_normal((2, 5, win)).astype(np.float32)
    ours = np.asarray(audio.power_spectrum(jnp.asarray(frames), consts))
    w = audio.hann_window(win)
    padded = np.zeros((2, 5, n_fft), np.float32)
    padded[..., :win] = frames * w
    ref = np.abs(np.fft.rfft(padded, axis=-1)) ** 2
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_mel_filterbank_invariants():
    fb = audio.mel_filterbank(16000, 512, 40)
    assert fb.shape == (257, 40)
    assert (fb >= 0).all()
    # every filter has some support and a single peak region
    assert (fb.sum(axis=0) > 0).all()
    # filters tile the spectrum: mid-range bins are covered
    coverage = fb.sum(axis=1)
    assert (coverage[10:200] > 0).all()


def test_dct_matrix_vs_direct():
    n = 12
    x = np.random.default_rng(0).standard_normal((3, n)).astype(np.float64)
    mat = audio.dct_matrix(n, n)
    ours = x @ mat
    # direct DCT-II ortho
    k = np.arange(n)
    ref = np.zeros_like(x)
    for ki in range(n):
        ref[:, ki] = 2 * (x * np.cos(np.pi * ki * (2 * k + 1) / (2 * n))).sum(axis=1)
    ref[:, 0] *= np.sqrt(1 / (4 * n))
    ref[:, 1:] *= np.sqrt(1 / (2 * n))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_frame_signal_shapes_and_content(rng):
    sig = np.arange(100, dtype=np.float32)[None].repeat(2, axis=0)
    frames = np.asarray(audio.frame_signal(jnp.asarray(sig), 16, 8, 5))
    assert frames.shape == (2, 5, 16)
    np.testing.assert_array_equal(frames[0, 0], np.arange(16))
    np.testing.assert_array_equal(frames[0, 2], np.arange(16, 32))


def test_waveform_to_features_end_to_end(rng):
    sr, n_fft, win, hop = 16000, 256, 200, 80
    n_mels, n_mfcc, T = 24, 13, 30
    consts = audio.make_audio_frontend_consts(sr, n_fft, win, n_mels, n_mfcc)
    t = np.arange(T * hop + win) / sr
    sig = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)[None]
    feats = audio.waveform_to_features(
        jnp.asarray(sig), consts, win, hop, T, feature="mfcc"
    )
    assert feats.shape == (1, T, n_mfcc)
    assert np.isfinite(np.asarray(feats)).all()
    lm = audio.waveform_to_features(jnp.asarray(sig), consts, win, hop, T, feature="logmel")
    assert lm.shape == (1, T, n_mels)
    # a 440 Hz tone concentrates energy in one mel band: argmax is stable
    band = np.asarray(lm)[0].argmax(axis=-1)
    assert (band == band[0]).all()


def test_mel_filterbank_analytic_golden():
    """Hand-computed golden case (librosa is not installed — SURVEY §5 item 2):
    with sr=8000, n_fft=8, n_mels=2, fmin=0, fmax=4000 the Slaney mel points
    are linearly spaced below 1 kHz... verify filter peaks sit at the
    analytically computed center frequencies and slopes are triangular."""
    sr, n_fft, n_mels = 8000, 64, 4
    fb = audio.mel_filterbank(sr, n_fft, n_mels, fmin=0.0, fmax=1000.0)
    # below 1 kHz the Slaney scale is linear, so centers are evenly spaced:
    # mel points at 0, 200, 400, 600, 800, 1000 Hz; centers 200..800.
    fft_freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    centers_hz = [200.0, 400.0, 600.0, 800.0]
    for m, c_hz in enumerate(centers_hz):
        peak_bin = fb[:, m].argmax()
        assert abs(fft_freqs[peak_bin] - c_hz) <= sr / n_fft, (
            f"filter {m} peaks at {fft_freqs[peak_bin]} Hz, expected ~{c_hz}"
        )
    # triangular: monotone up to the peak, monotone down after (within support)
    for m in range(n_mels):
        col = fb[:, m]
        p = col.argmax()
        sup = np.nonzero(col > 0)[0]
        assert (np.diff(col[sup[0]:p + 1]) >= -1e-7).all()
        assert (np.diff(col[p:sup[-1] + 1]) <= 1e-7).all()


# ---------------------------------------------------------------------------
# Stockham FFT path (DataConfig.audio_fft="stockham" — the accuracy-first
# power spectrum; VERDICT r4 weak 3 / SURVEY.md:169, 393-396 R2)


def test_stockham_power_spectrum_vs_numpy(rng):
    n_fft, win = 64, 48
    consts = audio.make_audio_frontend_consts(16000, n_fft, win, 12, 8)
    frames = rng.standard_normal((2, 5, win)).astype(np.float32)
    ours = np.asarray(audio.stockham_power_spectrum(jnp.asarray(frames), consts))
    w = audio.hann_window(win)
    padded = np.zeros((2, 5, n_fft), np.float32)
    padded[..., :win] = frames * w
    ref = np.abs(np.fft.rfft(padded, axis=-1)) ** 2
    # true-f32 butterflies: tighter than the matmul-DFT's GEMM tolerance
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_stockham_matches_matmul_dft(rng):
    """Both power_spectrum paths agree (same window fold, same bins)."""
    n_fft, win = 128, 100
    consts = audio.make_audio_frontend_consts(16000, n_fft, win, 12, 8)
    frames = rng.standard_normal((3, win)).astype(np.float32)
    mm = np.asarray(audio.power_spectrum(jnp.asarray(frames), consts))
    ff = np.asarray(audio.power_spectrum(jnp.asarray(frames), consts,
                                         fft="stockham"))
    np.testing.assert_allclose(ff, mm, rtol=1e-3, atol=1e-3)


def test_stockham_rejects_non_power_of_two():
    import pytest

    consts = audio.make_audio_frontend_consts(16000, 96, 64, 12, 8)
    with pytest.raises(ValueError, match="power-of-two"):
        audio.stockham_power_spectrum(jnp.zeros((2, 64)), consts)


def test_waveform_to_features_stockham_matches_matmul(rng):
    """The full frontend under audio_fft='stockham' == the matmul path for
    both feature types (mfcc + logmel), and the fused-kernel flag demotes
    cleanly (the Pallas melspec is matmul-DFT inside)."""
    sr, n_fft, win, hop, T = 16000, 128, 96, 48, 6
    consts = audio.make_audio_frontend_consts(sr, n_fft, win, 12, 8)
    sig = rng.standard_normal((2, T * hop + win)).astype(np.float32)
    for feature in ("mfcc", "logmel"):
        mm = np.asarray(audio.waveform_to_features(
            jnp.asarray(sig), consts, win, hop, T, feature=feature))
        ff = np.asarray(audio.waveform_to_features(
            jnp.asarray(sig), consts, win, hop, T, feature=feature,
            fft="stockham", fused=True))
        np.testing.assert_allclose(ff, mm, rtol=2e-3, atol=2e-3)
