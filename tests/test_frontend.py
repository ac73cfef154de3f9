"""End-to-end device-side pipeline: raw frames + waveform + token ids →
summary indices, as ONE jitted program (config 5's inference path).
"""

import numpy as np

import jax
import jax.numpy as jnp

from mmbidaf_tpu.config import tiny_test_config
from mmbidaf_tpu.data.frontend import apply_frontend, frontend_init, make_end_to_end_decode
from mmbidaf_tpu.data.synthetic import random_word_vectors, synthetic_batch
from mmbidaf_tpu.models.mmbidaf import mmbidaf_init
from mmbidaf_tpu.ops.vgg import TINY_SPEC


def _raw_batch(rng, cfg, B=2):
    d = cfg.data
    base = synthetic_batch(rng, cfg, batch_size=B)
    n_samples = d.max_audio_frames * d.hop_length + d.win_length
    return {
        "text_ids": base["text_ids"],
        "word_mask": base["word_mask"],
        "sent_mask": base["sent_mask"],
        "img_mask": base["img_mask"],
        "aud_mask": base["aud_mask"],
        "frames": (rng.random((B, d.max_keyframes, 24, 20, 3)) * 255).astype(np.uint8),
        "waveform": rng.standard_normal((B, n_samples)).astype(np.float32) * 0.1,
    }


def test_frontend_features_shapes(rng):
    cfg = tiny_test_config()
    # tiny VGG must output img_feat_dim-sized features
    import dataclasses

    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, img_feat_dim=32, audio_feat_dim=cfg.data.n_mfcc)
    )
    fe = frontend_init(jax.random.key(0), cfg, vgg_spec=TINY_SPEC)
    raw = {k: jnp.asarray(v) for k, v in _raw_batch(rng, cfg).items()}
    batch = apply_frontend(fe, raw, cfg, vgg_spec=TINY_SPEC)
    d = cfg.data
    assert batch["images"].shape == (2, d.max_keyframes, 32)
    assert batch["audio"].shape == (2, d.max_audio_frames, d.n_mfcc)
    assert np.isfinite(np.asarray(batch["images"])).all()
    assert np.isfinite(np.asarray(batch["audio"])).all()


def test_end_to_end_decode_one_program(rng):
    import dataclasses

    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, img_feat_dim=32, audio_feat_dim=cfg.data.n_mfcc)
    )
    wv = random_word_vectors(rng, cfg.data.vocab_size, cfg.model.emb_dim)
    params = mmbidaf_init(jax.random.key(1), cfg, jnp.asarray(wv))
    fe = frontend_init(jax.random.key(2), cfg, vgg_spec=TINY_SPEC)
    raw = {k: jnp.asarray(v) for k, v in _raw_batch(rng, cfg).items()}

    end_to_end = make_end_to_end_decode(cfg, vgg_spec=TINY_SPEC)
    log_p, picks = end_to_end(params, fe, raw)
    assert picks.shape == (2, cfg.model.max_decode_steps)
    # picks are valid sentence indices
    n_valid = np.asarray(raw["sent_mask"]).sum(axis=1)
    assert (np.asarray(picks) < n_valid[:, None]).all()


def test_vgg_frame_chunk_parity(rng):
    """Chunked resize+VGG (ModelConfig.vgg_frame_chunk) matches the single
    pass — frames are independent; only XLA fusion order differs between the
    two compiled programs (~1e-6 fp reassociation). Chunk sizes cover the
    non-divisible tail (B*T_i = 12 frames, chunk 5 → pad 3)."""
    import dataclasses

    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, img_feat_dim=32, audio_feat_dim=cfg.data.n_mfcc)
    )
    fe = frontend_init(jax.random.key(0), cfg, vgg_spec=TINY_SPEC)
    raw = {k: jnp.asarray(v) for k, v in _raw_batch(rng, cfg).items()}
    base = apply_frontend(fe, raw, cfg, vgg_spec=TINY_SPEC)

    for chunk in (5, 4):  # non-divisor (pads the tail) and divisor
        ccfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, vgg_frame_chunk=chunk)
        )
        got = apply_frontend(fe, raw, ccfg, vgg_spec=TINY_SPEC)
        np.testing.assert_allclose(
            np.asarray(got["images"]), np.asarray(base["images"]), rtol=1e-4, atol=1e-5
        )


def test_auto_vgg_chunk_policy():
    """vgg_frame_chunk=0 (auto): single pass while the two-live-buffer
    activation estimate fits the 14 GB budget; largest 128-multiple chunk
    otherwise. Anchored to the measured shapes: 1024 frames @224² bf16
    (serving B=64) stays single-pass, 2048 frames (B=128) chunks at 1024."""
    from mmbidaf_tpu.data.frontend import _auto_vgg_chunk

    assert _auto_vgg_chunk(1024, 224, 64, 2) == 0       # B=64 bf16: fits
    assert _auto_vgg_chunk(2048, 224, 64, 2) == 1024    # B=128 bf16: chunks
    assert _auto_vgg_chunk(512, 224, 64, 4) == 0        # fp32 B=32: fits
    assert _auto_vgg_chunk(1024, 224, 64, 4) == 512     # fp32 B=64: chunks
    assert _auto_vgg_chunk(4096, 32, 8, 4) == 0         # tiny spec: fits
    # huge image_size where even 128 frames blow the budget: the raw
    # fitting count (6 frames @~2.1 GB each), NOT a 128 floor that would
    # exceed small frame counts and silently disable chunking
    assert _auto_vgg_chunk(100, 2048, 64, 4) == 6
    # DP serving traces GLOBAL shapes but each chip holds 1/shards of the
    # activations: per-shard estimate, shard-scaled global chunk
    assert _auto_vgg_chunk(2048, 224, 64, 2, shards=8) == 0   # 256/chip: fits
    assert _auto_vgg_chunk(16384, 224, 64, 2, shards=8) == 8192  # 2048/chip
