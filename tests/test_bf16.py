"""bfloat16 compute path: runs, finite, and agrees with f32 on most picks."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from mmbidaf_tpu.config import tiny_test_config
from mmbidaf_tpu.data.synthetic import random_word_vectors, synthetic_batch
from mmbidaf_tpu.models.mmbidaf import mmbidaf_apply, mmbidaf_decode, mmbidaf_init
from mmbidaf_tpu.train.loop import nll_loss


def test_bf16_decode_close_to_f32(rng):
    cfg = tiny_test_config(hidden_size=32)
    wv = random_word_vectors(rng, cfg.data.vocab_size, cfg.model.emb_dim)
    params = mmbidaf_init(jax.random.key(0), cfg, jnp.asarray(wv))
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(rng, cfg, batch_size=8).items()}

    log_p32, picks32 = mmbidaf_decode(params, batch, cfg)
    cfg16 = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, compute_dtype="bfloat16")
    )
    log_p16, picks16 = mmbidaf_decode(params, batch, cfg16)

    assert log_p16.dtype == jnp.float32  # decoder stays f32
    assert np.isfinite(np.asarray(log_p16)).all()
    agree = (np.asarray(picks32) == np.asarray(picks16)).mean()
    assert agree >= 0.5, f"bf16 picks diverged too far: {agree:.2f} agreement"

    # teacher-forced loss close-ish
    l32 = float(nll_loss(mmbidaf_apply(params, batch, cfg), batch["targets"], batch["target_mask"]))
    l16 = float(nll_loss(mmbidaf_apply(params, batch, cfg16), batch["targets"], batch["target_mask"]))
    assert abs(l32 - l16) / max(abs(l32), 1e-6) < 0.2


def test_bf16_training_step(rng):
    """Mixed-precision training (compute_dtype=bfloat16: towers/attention
    on the bf16 MXU path, params + optimizer state + loss in f32): the
    step runs, grads are finite, params STAY f32, and the loss decreases
    on a fixed batch — the production recipe for faster training on the
    same model the serving config already runs in bf16."""
    from mmbidaf_tpu.train.loop import init_train_state, make_train_step

    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, compute_dtype="bfloat16", drop_prob=0.2
        ),
        train=dataclasses.replace(cfg.train, optimizer="adam", lr=5e-3),
    )
    wv = random_word_vectors(rng, cfg.data.vocab_size, cfg.model.emb_dim)
    params = mmbidaf_init(jax.random.key(0), cfg, jnp.asarray(wv))
    state = init_train_state(jax.random.key(1), params, cfg)
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(rng, cfg, batch_size=4).items()}

    step = make_train_step(cfg)
    losses = []
    for _ in range(30):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(state.params))
    assert losses[-1] < losses[0] * 0.8, losses[:: len(losses) - 1]
