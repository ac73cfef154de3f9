"""End-to-end smoke: synthetic corpus → train steps → loss decreases →
decode → ROUGE computes (SURVEY.md §5 item 4), plus checkpoint round-trip.
"""

import numpy as np

import jax
import jax.numpy as jnp

from mmbidaf_tpu.config import dataclasses, tiny_test_config
from mmbidaf_tpu.data.synthetic import random_word_vectors, synthetic_batch
from mmbidaf_tpu.models.mmbidaf import mmbidaf_init
from mmbidaf_tpu.train.loop import (
    init_train_state,
    make_eval_step,
    make_train_step,
    nll_loss,
)
from mmbidaf_tpu.train.metrics import AverageMeter, rouge_scores, summary_from_picks


def _setup(seed=0, use_audio=True, use_images=True):
    cfg = tiny_test_config(use_images=use_images, use_audio=use_audio)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, optimizer="adam", lr=5e-3)
    )
    rng = np.random.default_rng(seed)
    wv = random_word_vectors(rng, cfg.data.vocab_size, cfg.model.emb_dim)
    params = mmbidaf_init(jax.random.key(seed), cfg, jnp.asarray(wv))
    state = init_train_state(jax.random.key(seed + 1), params, cfg)
    return cfg, rng, state


def test_loss_decreases_on_fixed_batch():
    cfg, rng, state = _setup()
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(rng, cfg, batch_size=4).items()}
    train_step = make_train_step(cfg)
    losses = []
    for _ in range(50):
        state, metrics = train_step(state, batch)
        losses.append(float(metrics["loss"]))
    assert min(losses) < losses[0] * 0.6, f"loss did not decrease: {losses[0]} -> {min(losses)}"
    assert np.isfinite(losses).all()


def test_frozen_embedding_table():
    cfg, rng, state = _setup(seed=1)
    table_before = np.asarray(state.params["embedding"]["table"])
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(rng, cfg, batch_size=4).items()}
    train_step = make_train_step(cfg)
    state, _ = train_step(state, batch)
    np.testing.assert_array_equal(
        np.asarray(state.params["embedding"]["table"]), table_before
    )
    # but other params moved: fuse_w must differ from its EMA shadow, which
    # still sits at the init value after one step (decay keeps it ~there).
    assert not np.array_equal(
        np.asarray(state.params["fuse_w"]), np.asarray(state.ema_params["fuse_w"])
    ), "fuse_w did not move after a train step"


def test_eval_step_and_rouge():
    cfg, rng, state = _setup(seed=2)
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(rng, cfg, batch_size=2).items()}
    eval_step = make_eval_step(cfg)
    out = eval_step(state.ema_params, batch)
    picks = np.asarray(out["picks"])
    assert picks.shape == (2, cfg.model.max_decode_steps)
    sentences = [f"sentence number {i} about topic {i % 3}." for i in range(cfg.data.max_sentences)]
    summary = summary_from_picks(picks[0], sentences)
    gold = " ".join(sentences[i] for i in np.asarray(batch["targets"])[0])
    scores = rouge_scores(summary, gold)
    assert set(scores) == {"ROUGE-1", "ROUGE-2", "ROUGE-L"}
    assert all(0.0 <= v <= 1.0 for v in scores.values())


def test_nll_loss_matches_manual():
    log_p = jnp.log(jnp.asarray([[[0.7, 0.2, 0.1], [0.1, 0.8, 0.1]]]))
    targets = jnp.asarray([[0, 1]])
    mask = jnp.ones((1, 2))
    loss = nll_loss(log_p, targets, mask)
    expected = -(np.log(0.7) + np.log(0.8)) / 2
    np.testing.assert_allclose(float(loss), expected, rtol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    from mmbidaf_tpu.train import checkpoint as ckpt

    cfg, rng, state = _setup(seed=3)
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(rng, cfg, batch_size=2).items()}
    train_step = make_train_step(cfg)
    state, _ = train_step(state, batch)

    mgr = ckpt.make_manager(str(tmp_path / "ckpts"), metric_name="loss", maximize=False)
    ckpt.save(mgr, state, {"loss": 1.0})

    cfg2, _, template = _setup(seed=4)
    restored = ckpt.restore_latest(mgr, template)
    assert restored is not None
    assert int(restored.step) == int(state.step)
    np.testing.assert_allclose(
        np.asarray(restored.params["fuse_w"]), np.asarray(state.params["fuse_w"])
    )


def test_average_meter():
    m = AverageMeter()
    m.update(1.0, 2)
    m.update(4.0, 1)
    assert abs(m.avg - 2.0) < 1e-9


def test_lr_schedules():
    from mmbidaf_tpu.config import Config, TrainConfig
    from mmbidaf_tpu.train.loop import make_lr_schedule

    base = Config()
    cos = dataclasses.replace(
        base, train=TrainConfig(lr=1.0, lr_schedule="cosine", warmup_steps=10, decay_steps=100)
    )
    sched = make_lr_schedule(cos)
    assert float(sched(0)) == 0.0
    assert abs(float(sched(10)) - 1.0) < 1e-6
    assert float(sched(110)) < 0.05  # decayed to ~alpha
    exp = dataclasses.replace(
        base, train=TrainConfig(lr=1.0, lr_schedule="exponential", decay_steps=100)
    )
    assert float(make_lr_schedule(exp)(100)) <= 0.011


def test_tensorboard_writer(tmp_path):
    import os

    from mmbidaf_tpu.train.metrics import TensorboardWriter

    w = TensorboardWriter(str(tmp_path / "tb"))
    w.log(1, {"loss": 0.5})
    if w.active:
        assert any(files for _, _, files in os.walk(str(tmp_path / "tb")))


def test_config_saved_with_checkpoints(tmp_path):
    from mmbidaf_tpu.train import checkpoint as ckpt

    cfg = tiny_test_config()
    ckpt.save_config(str(tmp_path), cfg)
    cfg2 = ckpt.load_config(str(tmp_path))
    assert cfg2 == cfg


def test_grad_accumulation_matches_full_batch():
    """grad_accum_steps=4 produces the same updated params and loss as the
    single-pass step — exact full-batch gradient semantics, including with
    ragged target masks (unequal valid counts per microbatch)."""
    cfg, rng, state = _setup(seed=3)
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(rng, cfg, batch_size=8).items()}
    # make masks ragged ACROSS microbatch boundaries
    tm = np.asarray(batch["target_mask"]).copy()
    tm[0, 1:] = 0.0
    tm[3, :] = 1.0
    tm[5, 2:] = 0.0
    batch["target_mask"] = jnp.asarray(tm)

    cfg_acc = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, grad_accum_steps=4)
    )
    s1, m1 = make_train_step(cfg)(state, batch)
    _, _, state2 = _setup(seed=3)
    s2, m2 = make_train_step(cfg_acc)(state2, batch)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    np.testing.assert_allclose(
        float(m1["grad_norm"]), float(m2["grad_norm"]), rtol=1e-5
    )
    # Post-adam params: microbatch vs full-batch forwards reassociate fp
    # differently (different GEMM shapes), and adam's g/(sqrt(g^2)+eps)
    # blows those ~1e-7 grad deltas up to O(lr) on near-zero-grad elements —
    # so params are bounded by a fraction of lr (5e-3), while the gradient
    # MATH itself is pinned tightly by the companion test below.
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=6e-4
        ),
        s1.params, s2.params,
    )


def test_grad_accumulation_gradient_math():
    """The sum-unnormalized-then-divide recipe == the full-batch gradient
    of the mean NLL, with ragged masks (tight tolerance: same forward
    shapes, so only the accumulation order differs)."""
    from mmbidaf_tpu.models.mmbidaf import mmbidaf_apply
    from mmbidaf_tpu.train.loop import nll_sum

    cfg, rng, state = _setup(seed=5)
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(rng, cfg, batch_size=8).items()}
    tm = np.asarray(batch["target_mask"]).copy()
    tm[1, 1:] = 0.0
    tm[6, 2:] = 0.0
    batch["target_mask"] = jnp.asarray(tm)
    accum = 4
    params = state.params

    def sum_fn(p, mb):
        log_p = mmbidaf_apply(p, mb, cfg, rng=None)
        return nll_sum(log_p, mb["targets"], mb["target_mask"])

    # accumulate per-microbatch unnormalized grads, divide once
    mbs = [
        {k: v[i * 2:(i + 1) * 2] for k, v in batch.items()} for i in range(accum)
    ]
    g_acc = None
    count = 0.0
    for mb in mbs:
        (_, c), g = jax.value_and_grad(sum_fn, has_aux=True)(params, mb)
        count += float(c)
        g_acc = g if g_acc is None else jax.tree.map(jnp.add, g_acc, g)
    g_acc = jax.tree.map(lambda x: x / count, g_acc)

    # full-batch mean-NLL gradient, identical microbatch forward shapes:
    # sum of per-microbatch totals / total count
    def full_fn(p):
        total = 0.0
        cnt = 0.0
        for mb in mbs:
            t, c = sum_fn(p, mb)
            total = total + t
            cnt = cnt + c
        return total / cnt

    g_full = jax.grad(full_fn)(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        ),
        g_acc, g_full,
    )


def test_grad_accumulation_raw_frontend_path():
    """With raw frames/waveform batches the frozen frontend runs INSIDE each
    microbatch (that's where the VGG activation memory is); accumulated step
    equals the single-pass raw step."""
    from mmbidaf_tpu.data.frontend import frontend_init
    from mmbidaf_tpu.ops.vgg import TINY_SPEC

    cfg, rng, _ = _setup(seed=7)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, img_feat_dim=32,
                                       audio_feat_dim=cfg.data.n_mfcc)
    )
    d = cfg.data
    B = 4
    wv = random_word_vectors(rng, d.vocab_size, cfg.model.emb_dim)
    params = mmbidaf_init(jax.random.key(7), cfg, jnp.asarray(wv))
    state1 = init_train_state(jax.random.key(8), params, cfg)
    # fresh buffers: train_step donates its state, which would delete
    # params shared with state1
    state2 = init_train_state(jax.random.key(8), jax.tree.map(jnp.copy, params), cfg)
    fe = frontend_init(jax.random.key(9), cfg, vgg_spec=TINY_SPEC)

    feat = synthetic_batch(rng, cfg, batch_size=B)
    n_samples = d.max_audio_frames * d.hop_length + d.win_length
    raw = {
        "text_ids": feat["text_ids"], "word_mask": feat["word_mask"],
        "sent_mask": feat["sent_mask"],
        "frames": rng.random((B, d.max_keyframes, 24, 20, 3)).astype(np.float32),
        "img_mask": feat["img_mask"],
        "waveform": rng.standard_normal((B, n_samples)).astype(np.float32),
        "aud_mask": np.ones((B, d.max_audio_frames), np.float32),
        "targets": feat["targets"], "target_mask": feat["target_mask"],
    }
    raw = {k: jnp.asarray(v) for k, v in raw.items()}

    cfg_acc = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, grad_accum_steps=2)
    )
    s1, m1 = make_train_step(cfg, fe_params=fe, vgg_spec=TINY_SPEC)(state1, raw)
    s2, m2 = make_train_step(cfg_acc, fe_params=fe, vgg_spec=TINY_SPEC)(state2, raw)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=6e-4
        ),
        s1.params, s2.params,
    )


def test_concat_linear_fusion_variant():
    """ModelConfig.fusion="concat_linear" (SURVEY §3.1's other plausible
    reading of the reference's fusion op) trains and decodes without the
    modeling BiLSTM."""
    cfg, rng, _ = _setup(seed=11)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, fusion="concat_linear")
    )
    wv = random_word_vectors(rng, cfg.data.vocab_size, cfg.model.emb_dim)
    params = mmbidaf_init(jax.random.key(11), cfg, jnp.asarray(wv))
    assert "model_lstm" not in params
    state = init_train_state(jax.random.key(12), params, cfg)
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(rng, cfg, batch_size=2).items()}
    state, metrics = make_train_step(cfg)(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    out = make_eval_step(cfg)(state.ema_params, batch)
    assert np.asarray(out["picks"]).shape == (2, cfg.model.max_decode_steps)


def test_flat_updates_matches_tree_path():
    """TrainConfig.flat_updates ravels the trainable leaves into one vector
    for the clip+decay+optimizer math (the train-step "optimizer tail" —
    ROADMAP item 4). Parity: N real train steps under each setting must
    produce the same params/opt trajectory (elementwise math is identical;
    only the global-norm sum reassociates)."""
    from mmbidaf_tpu.train.loop import make_optimizer

    for opt_name in ("adadelta", "adam"):
        states = {}
        for flat in (True, False):
            cfg, rng, state = _setup(seed=7)
            cfg = dataclasses.replace(
                cfg,
                train=dataclasses.replace(
                    cfg.train, optimizer=opt_name, l2_wd=1e-4, flat_updates=flat
                ),
            )
            # _setup built opt_state with its own (adam, tree) optimizer;
            # rebuild for THIS cfg so state layout matches the step's tx.
            params = state.params
            state = init_train_state(jax.random.key(8), params, cfg)
            batch = {
                k: jnp.asarray(v)
                for k, v in synthetic_batch(rng, cfg, batch_size=4).items()
            }
            train_step = make_train_step(cfg)
            for _ in range(3):
                state, metrics = train_step(state, batch)
            states[flat] = (state, float(metrics["loss"]))
        # Identical trajectories modulo fp reassociation of the clip norm.
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6
            ),
            states[True][0].params,
            states[False][0].params,
        )
        assert abs(states[True][1] - states[False][1]) < 1e-5

        # Flat opt_state really is flat: exactly one accumulator vector per
        # moment, not one per leaf.
        cfg_flat = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, flat_updates=True)
        )
        tx = make_optimizer(cfg_flat)
        leaves = [
            l for l in jax.tree.leaves(tx.init(states[True][0].params)) if l.ndim == 1
        ]
        assert any(l.size > 1000 for l in leaves), "no raveled accumulator found"


def test_flat_updates_checkpoint_mismatch_is_actionable(tmp_path):
    """Restoring a flat-opt_state checkpoint with a tree-opt_state template
    (or vice versa) must fail with a message naming `flat_updates` and the
    overlay that fixes it — not a bare orbax structure error."""
    import pytest

    from mmbidaf_tpu.train import checkpoint as ckpt

    cfg, rng, state = _setup(seed=21)
    cfg_flat = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, flat_updates=True)
    )
    state = init_train_state(jax.random.key(22), state.params, cfg_flat)
    mgr = ckpt.make_manager(str(tmp_path / "ck"), metric_name="loss", maximize=False)
    ckpt.save(mgr, state, {"loss": 1.0})

    cfg_tree = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, flat_updates=False)
    )
    template = init_train_state(jax.random.key(23), state.params, cfg_tree)
    with pytest.raises(RuntimeError, match="flat_updates"):
        ckpt.restore_latest(mgr, template)


def test_remat_towers_matches_plain_step():
    """TrainConfig.remat_towers (jax.checkpoint around the encoder towers)
    recomputes the SAME forward in backprop — loss, grad norm, and updated
    params match the un-remat'ed step to fp-reassociation noise. Covers
    the dropout path (rng consumption must be identical under remat)."""
    cfg, rng, state = _setup(seed=11)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, drop_prob=0.2)
    )
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(rng, cfg, batch_size=4).items()}
    cfg_remat = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, remat_towers=True)
    )
    s1, m1 = make_train_step(cfg)(state, batch)
    _, _, state2 = _setup(seed=11)
    s2, m2 = make_train_step(cfg_remat)(state2, batch)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    np.testing.assert_allclose(float(m1["grad_norm"]), float(m2["grad_norm"]), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=6e-4
        ),
        s1.params, s2.params,
    )


def test_remat_towers_pallas_kernels():
    """remat composes with the custom-VJP Pallas kernels (attention +
    LSTM BPTT): the checkpointed tower re-invokes the fused backward."""
    cfg, rng, state = _setup(seed=13)
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, use_pallas_attention=True, use_pallas_lstm=True,
            drop_prob=0.0,
        ),
    )
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(rng, cfg, batch_size=4).items()}
    cfg_remat = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, remat_towers=True)
    )
    s1, m1 = make_train_step(cfg)(state, batch)
    _, _, state2 = _setup(seed=13)
    s2, m2 = make_train_step(cfg_remat)(state2, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    np.testing.assert_allclose(float(m1["grad_norm"]), float(m2["grad_norm"]), rtol=1e-5)
