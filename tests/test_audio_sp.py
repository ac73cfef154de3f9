"""Sequence-parallel mel frontend == single-device frontend (8-dev CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmbidaf_tpu.ops import audio
from mmbidaf_tpu.parallel.audio_sp import make_sp_audio_frontend


@pytest.mark.parametrize("feature", ["mfcc", "logmel"])
def test_sp_frontend_matches_single_device(rng, eight_device_mesh, feature):
    sr, n_fft, win, hop = 16000, 256, 200, 80
    n_mels, n_mfcc, T = 24, 13, 64  # 64 frames / 8 devices
    consts = audio.make_audio_frontend_consts(sr, n_fft, win, n_mels, n_mfcc)
    n_samples = (T - 1) * hop + win + hop  # margin for the last slab's halo
    sig = jnp.asarray(rng.standard_normal((3, n_samples)).astype(np.float32))

    ref = audio.waveform_to_features(sig, consts, win, hop, T, feature=feature)

    sp_frontend = make_sp_audio_frontend(
        eight_device_mesh, consts, win, hop, T, feature=feature
    )
    out = sp_frontend(sig)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)
