"""The five graded capability configs (SURVEY.md §1 [B:6-12]) as loadable
preset artifacts: examples/configs/*.json parse, init, and describe the
intended tower combinations; the text-only preset runs a full forward."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmbidaf_tpu.config import config_from_json

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PRESETS = {
    "config1_text_only": (False, False),
    "config2_text_image": (True, False),
    "config3_text_audio": (False, True),
    "config4_trimodal": (True, True),
    "config5_serving_v5e8": (True, True),
    "config6_sp_long_audio": (True, True),
}


@pytest.mark.parametrize("name", sorted(PRESETS))
def test_preset_loads_and_inits(name):
    cfg = config_from_json(os.path.join(REPO, "examples", "configs", f"{name}.json"))
    use_images, use_audio = PRESETS[name]
    assert cfg.model.use_images == use_images
    assert cfg.model.use_audio == use_audio
    if name == "config5_serving_v5e8":
        assert cfg.mesh.num_data == 8
        assert cfg.train.batch_size == 32
        assert cfg.model.compute_dtype == "bfloat16"
    if name == "config6_sp_long_audio":
        assert cfg.mesh.sp_audio and cfg.mesh.num_seq == 8
        assert cfg.data.max_audio_frames % cfg.mesh.num_seq == 0

    from mmbidaf_tpu.data.synthetic import random_word_vectors
    from mmbidaf_tpu.models.mmbidaf import mmbidaf_init

    wv = random_word_vectors(np.random.default_rng(0), 100, cfg.model.emb_dim)
    params = mmbidaf_init(jax.random.key(0), cfg, jnp.asarray(wv))
    assert ("att_img" in params) == use_images
    assert ("att_aud" in params) == use_audio


def test_text_only_preset_forward():
    import dataclasses

    from mmbidaf_tpu.data.synthetic import random_word_vectors, synthetic_batch
    from mmbidaf_tpu.models.mmbidaf import mmbidaf_apply, mmbidaf_init

    cfg = config_from_json(
        os.path.join(REPO, "examples", "configs", "config1_text_only.json")
    )
    # full hidden size, tiny sequence dims for CPU test speed
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, max_sentences=6, max_words=5,
                                 max_keyframes=4, max_audio_frames=8,
                                 vocab_size=100),
        model=dataclasses.replace(cfg.model, drop_prob=0.0),
    )
    rng = np.random.default_rng(1)
    wv = random_word_vectors(rng, cfg.data.vocab_size, cfg.model.emb_dim)
    params = mmbidaf_init(jax.random.key(1), cfg, jnp.asarray(wv))
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(rng, cfg, batch_size=2).items()}
    log_p = mmbidaf_apply(params, batch, cfg)
    assert log_p.shape == (2, cfg.model.max_decode_steps, cfg.data.max_sentences)
    assert np.isfinite(np.asarray(log_p)).all()
