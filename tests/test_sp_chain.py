"""Fully-sharded audio tower: SP mel/MFCC frontend (no gather) → SP
BiLSTM → ring BiDAF attention, with the long frame axis never gathered
onto one device — end-to-end parity vs the local chain (8-dev CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mmbidaf_tpu.ops import audio
from mmbidaf_tpu.ops.bidaf import bidaf_apply, bidaf_init
from mmbidaf_tpu.ops.lstm import bilstm_apply, bilstm_init
from mmbidaf_tpu.parallel.audio_sp import make_sp_audio_frontend
from mmbidaf_tpu.parallel.ring_attention import make_ring_bidaf
from mmbidaf_tpu.parallel.sp_lstm import make_sp_bilstm


@pytest.mark.parametrize("feature", ["mfcc", "logmel"])
def test_sp_frontend_no_gather_matches(rng, eight_device_mesh, feature):
    """gather=False output (frame-sharded, pmax dB reference) == the local
    frontend, and it actually stays sharded on the frame axis."""
    sr, n_fft, win, hop = 16000, 256, 200, 80
    n_mels, n_mfcc, T = 24, 13, 64
    consts = audio.make_audio_frontend_consts(sr, n_fft, win, n_mels, n_mfcc)
    n_samples = (T - 1) * hop + win + hop
    sig = jnp.asarray(rng.standard_normal((3, n_samples)).astype(np.float32))

    ref = audio.waveform_to_features(sig, consts, win, hop, T, feature=feature)
    sp = make_sp_audio_frontend(
        eight_device_mesh, consts, win, hop, T, feature=feature, gather=False
    )
    out = sp(sig)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)
    spec = out.sharding.spec
    assert len(spec) >= 2 and spec[1] is not None, spec


def test_sharded_audio_tower_chain(rng, eight_device_mesh):
    """waveform → SP-MFCC → SP-BiLSTM → ring BiDAF == the local chain.

    The audio frame axis (the pipeline's one long sequence) stays sharded
    across all three stages — SCALING.md's no-gather scaling story."""
    mesh = eight_device_mesh
    sr, n_fft, win, hop = 16000, 256, 200, 80
    n_mels, n_mfcc, T = 24, 13, 64
    B, h = 2, 8
    consts = audio.make_audio_frontend_consts(sr, n_fft, win, n_mels, n_mfcc)
    n_samples = (T - 1) * hop + win + hop
    sig = jnp.asarray(rng.standard_normal((B, n_samples)).astype(np.float32))
    aud_mask = jnp.ones((B, T), jnp.float32)

    lstm_p = bilstm_init(jax.random.key(0), n_mfcc, h)
    D = 2 * h
    att = bidaf_init(jax.random.key(1), D)
    T_c = 16  # text anchor (context); sharded over the ring too
    c = jnp.asarray(rng.standard_normal((B, T_c, D)).astype(np.float32))
    c_mask = jnp.ones((B, T_c), jnp.float32)

    # local reference chain
    feat_ref = audio.waveform_to_features(sig, consts, win, hop, T, feature="mfcc")
    enc_ref, _ = bilstm_apply(lstm_p, feat_ref, aud_mask)
    g_ref = bidaf_apply(att, c, enc_ref, c_mask, aud_mask)

    # sharded chain: features and encodings never leave their time shards
    feat = make_sp_audio_frontend(
        mesh, consts, win, hop, T, feature="mfcc", gather=False
    )(sig)
    assert feat.sharding.spec[1] is not None
    enc = make_sp_bilstm(mesh)(lstm_p, feat, aud_mask)
    assert enc.sharding.spec[1] is not None
    g = make_ring_bidaf(mesh)(att, c, enc, c_mask, aud_mask)

    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=3e-4, atol=3e-5)
