"""Pallas kernel parity vs the jnp reference implementations, in interpret
mode on CPU (SURVEY.md §5 item 2; compiled-on-TPU timing lives in bench).
"""

import numpy as np

import jax.numpy as jnp

from mmbidaf_tpu.ops import audio
from mmbidaf_tpu.ops.bidaf import bidaf_apply, bidaf_init
from mmbidaf_tpu.ops.pallas.bidaf_kernel import bidaf_attention_fused
from mmbidaf_tpu.ops.pallas.melspec_kernel import log_mel_fused

import jax


def _ragged_mask(rng, B, T):
    lengths = rng.integers(1, T + 1, size=B)
    lengths[0] = T
    return (np.arange(T)[None, :] < lengths[:, None]).astype(np.float32)


def test_fused_bidaf_matches_jnp(rng):
    B, T_c, T_q, D = 3, 12, 9, 16
    params = bidaf_init(jax.random.key(0), D)
    c = jnp.asarray(rng.standard_normal((B, T_c, D)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((B, T_q, D)).astype(np.float32))
    c_mask = jnp.asarray(_ragged_mask(rng, B, T_c))
    q_mask = jnp.asarray(_ragged_mask(rng, B, T_q))

    ref = bidaf_apply(params, c, q, c_mask, q_mask)
    fused = bidaf_attention_fused(params, c, q, c_mask, q_mask, interpret=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-5)


def test_fused_logmel_matches_jnp(rng):
    n_fft, win = 64, 48
    consts = audio.make_audio_frontend_consts(16000, n_fft, win, 12, 8)
    frames = jnp.asarray(rng.standard_normal((2, 37, win)).astype(np.float32))
    ref = audio.log_mel(frames, consts)
    fused = log_mel_fused(frames, consts, tile_n=16, interpret=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), rtol=2e-4, atol=1e-5)


def test_fused_mfcc_matches_jnp(rng):
    """One-pass whole-example MFCC kernel (incl. the per-example global-max
    dB reference) == the jnp chain, and the waveform_to_features fused path
    dispatches to it under the size bound."""
    from mmbidaf_tpu.ops.pallas.melspec_kernel import mfcc_fused

    n_fft, win, hop = 64, 48, 16
    consts = audio.make_audio_frontend_consts(16000, n_fft, win, 12, 8)
    frames = jnp.asarray(rng.standard_normal((3, 37, win)).astype(np.float32))
    ref = audio.mfcc(frames, consts)
    fused = mfcc_fused(frames, consts, interpret=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), rtol=2e-4, atol=2e-5)

    # silent example (all-zero frames): the ref=max(db) degenerate case
    silent = frames.at[1].set(0.0)
    np.testing.assert_allclose(
        np.asarray(mfcc_fused(silent, consts, interpret=True)),
        np.asarray(audio.mfcc(silent, consts)),
        rtol=2e-4, atol=2e-5,
    )

    # end-to-end fused dispatch path
    T = 20
    sig = jnp.asarray(rng.standard_normal((2, T * hop + win)).astype(np.float32))
    out_f = audio.waveform_to_features(sig, consts, win, hop, T, feature="mfcc", fused=True)
    out_r = audio.waveform_to_features(sig, consts, win, hop, T, feature="mfcc", fused=False)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r), rtol=2e-4, atol=2e-5)


def test_model_decode_with_pallas_attention_matches(rng):
    """Full-model greedy decode with the fused kernel == jnp path (CPU interpret)."""
    import dataclasses

    from mmbidaf_tpu.config import tiny_test_config
    from mmbidaf_tpu.data.synthetic import random_word_vectors, synthetic_batch
    from mmbidaf_tpu.models.mmbidaf import mmbidaf_decode, mmbidaf_init

    cfg = tiny_test_config()
    wv = random_word_vectors(rng, cfg.data.vocab_size, cfg.model.emb_dim)
    params = mmbidaf_init(jax.random.key(0), cfg, jnp.asarray(wv))
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(rng, cfg, batch_size=3).items()}

    log_p_ref, picks_ref = mmbidaf_decode(params, batch, cfg)
    cfg_pl = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, use_pallas_attention=True)
    )
    log_p_pl, picks_pl = mmbidaf_decode(params, batch, cfg_pl)
    np.testing.assert_array_equal(np.asarray(picks_ref), np.asarray(picks_pl))
    np.testing.assert_allclose(np.asarray(log_p_ref), np.asarray(log_p_pl), atol=2e-5)


def test_pallas_lstm_matches_scan(rng):
    from mmbidaf_tpu.ops.lstm import bilstm_apply, bilstm_init
    from mmbidaf_tpu.ops.pallas.lstm_kernel import bilstm_pallas

    B, T, in_dim, h = 4, 11, 6, 8
    params = bilstm_init(jax.random.key(3), in_dim, h)
    x = jnp.asarray(rng.standard_normal((B, T, in_dim)).astype(np.float32))
    lengths = np.array([11, 5, 1, 8])
    mask = jnp.asarray((np.arange(T)[None] < lengths[:, None]).astype(np.float32))

    ref_out, (ref_h, ref_c) = bilstm_apply(params, x, mask)
    out, (h_n, c_n) = bilstm_pallas(params, x, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=2e-5)
    np.testing.assert_allclose(np.asarray(h_n), np.asarray(ref_h), atol=2e-5)
    np.testing.assert_allclose(np.asarray(c_n), np.asarray(ref_c), atol=2e-5)


def test_model_decode_with_pallas_lstm_matches(rng):
    """Full-model greedy decode with the Pallas LSTM == scan path (interpret)."""
    import dataclasses

    from mmbidaf_tpu.config import tiny_test_config
    from mmbidaf_tpu.data.synthetic import random_word_vectors, synthetic_batch
    from mmbidaf_tpu.models.mmbidaf import mmbidaf_decode, mmbidaf_init

    cfg = tiny_test_config()
    wv = random_word_vectors(rng, cfg.data.vocab_size, cfg.model.emb_dim)
    params = mmbidaf_init(jax.random.key(1), cfg, jnp.asarray(wv))
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(rng, cfg, batch_size=2).items()}

    log_p_ref, picks_ref = mmbidaf_decode(params, batch, cfg)
    cfg_pl = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, use_pallas_lstm=True)
    )
    log_p_pl, picks_pl = mmbidaf_decode(params, batch, cfg_pl)
    np.testing.assert_array_equal(np.asarray(picks_ref), np.asarray(picks_pl))
    np.testing.assert_allclose(np.asarray(log_p_ref), np.asarray(log_p_pl), atol=3e-5)


def test_lstm_vmem_guard_row_chunks_huge_batch(rng):
    """Effective batches that would overflow the kernel's 16 MiB scoped
    VMEM (word-level LSTM sees batch × sentences rows; measured 26 MB at
    B=4096, h=128) now run the kernel ROW-CHUNKED over an outer grid
    dimension; only batches with no usable divisor chunk (huge primes)
    fall back to the jnp scan. Neither crashes the compile."""
    from mmbidaf_tpu.ops.lstm import bilstm_apply, bilstm_init
    from mmbidaf_tpu.ops.pallas.lstm_kernel import (
        _best_row_chunk, _fits_vmem, bilstm_pallas, bilstm_pallas_trainable,
    )

    params = bilstm_init(jax.random.key(0), 8, 128)
    assert _fits_vmem(params, jnp.zeros((1024, 16, 8)))
    assert not _fits_vmem(params, jnp.zeros((4096, 16, 8)))
    # trainable holds ~2x (backward residuals + dW_h accumulator)
    assert not _fits_vmem(params, jnp.zeros((2048, 16, 8)), scale=2)

    # divisible overflow → a chunk is found (and halves again for trainable)
    assert _best_row_chunk(params, jnp.zeros((4096, 16, 8))) == 2048
    assert _best_row_chunk(params, jnp.zeros((4096, 16, 8)), scale=2) == 1024
    # fits outright → 0 (single-block program, unchanged HLO)
    assert _best_row_chunk(params, jnp.zeros((1024, 16, 8))) == 0
    # huge prime → no usable divisor → scan fallback
    assert _best_row_chunk(params, jnp.zeros((4099, 16, 8))) is None

    # oversized-but-divisible dispatch runs row-chunked (interpret mode on
    # CPU) and matches the scan; shrink rows to keep interpret-mode cheap
    # while still forcing a multi-chunk grid via the real selector on a
    # pretend-huge batch: call the kernel with an explicit chunk instead.
    x = jnp.asarray(rng.standard_normal((4099, 4, 8)).astype(np.float32))
    mask = jnp.ones((4099, 4), jnp.float32)
    out, (h, c) = bilstm_pallas(params, x, mask)       # prime → scan fallback
    want, (hw, cw) = bilstm_apply(params, x, mask)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want))
    out_t, _ = bilstm_pallas_trainable(params, x, mask)
    np.testing.assert_array_equal(np.asarray(out_t), np.asarray(want))


def test_lstm_row_chunked_kernel_parity(rng):
    """The row-chunked grid (explicit ``row_chunk``) matches the jnp scan —
    both directions, ragged masks, a non-sublane-aligned chunk, and BPTT
    grads through the chunked backward kernel (dW_h accumulates across
    row-chunks; dh/dc carries re-seed per chunk)."""
    from mmbidaf_tpu.ops.lstm import bilstm_apply, bilstm_init, lstm_scan
    from mmbidaf_tpu.ops.pallas.lstm_kernel import (
        lstm_pallas, lstm_pallas_trainable,
    )

    B, T, in_dim, h = 12, 7, 6, 8
    params = bilstm_init(jax.random.key(3), in_dim, h)
    x = jnp.asarray(rng.standard_normal((B, T, in_dim)).astype(np.float32))
    lengths = rng.integers(1, T + 1, size=B)
    mask = jnp.asarray((np.arange(T)[None] < lengths[:, None]).astype(np.float32))

    import pytest

    # non-divisor chunks are rejected on BOTH entry points (a (nb, T) grid
    # would silently leave tail rows as uninitialized VMEM garbage)
    with pytest.raises(ValueError, match="must divide"):
        lstm_pallas(params["fwd"], x, mask, interpret=True, row_chunk=5)
    with pytest.raises(ValueError, match="must divide"):
        lstm_pallas_trainable(params["fwd"], x, mask, False, True, 5)

    for reverse in (False, True):
        want, (hw, cw) = lstm_scan(params["fwd"], x, mask, reverse=reverse)
        for chunk in (4, 3):  # aligned and non-sublane-aligned
            out, (hh, cc) = lstm_pallas(
                params["fwd"], x, mask, reverse=reverse, interpret=True, row_chunk=chunk
            )
            np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-6)
            np.testing.assert_allclose(np.asarray(hh), np.asarray(hw), atol=1e-6)
            np.testing.assert_allclose(np.asarray(cc), np.asarray(cw), atol=1e-6)

    def loss_chunked(p, xx):
        out_f, (h_f, c_f) = lstm_pallas_trainable(p["fwd"], xx, mask, False, True, 4)
        out_b, (h_b, c_b) = lstm_pallas_trainable(p["bwd"], xx, mask, True, True, 4)
        out = jnp.concatenate([out_f, out_b], axis=-1)
        return (out ** 2).sum() + (h_f * 0.3).sum() + (c_b ** 2).sum()

    def loss_ref(p, xx):
        out, (h_n, c_n) = bilstm_apply(p, xx, mask)
        return (out ** 2).sum() + (h_n[:, :h] * 0.3).sum() + (c_n[:, h:] ** 2).sum()

    gc = jax.grad(loss_chunked, argnums=(0, 1))(params, x)
    gr = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree.leaves(gc), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-5)


def test_fused_bidaf_trainable_grads_match_jnp(rng):
    """custom-VJP fused attention: grads == jnp reference grads (interpret)."""
    from mmbidaf_tpu.ops.pallas.bidaf_kernel import bidaf_attention_fused_trainable

    B, T_c, T_q, D = 2, 6, 5, 8
    params = bidaf_init(jax.random.key(4), D)
    c = jnp.asarray(rng.standard_normal((B, T_c, D)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((B, T_q, D)).astype(np.float32))
    c_mask = jnp.asarray(_ragged_mask(rng, B, T_c))
    q_mask = jnp.asarray(_ragged_mask(rng, B, T_q))

    def loss_fused(p, cc, qq):
        return (bidaf_attention_fused_trainable(p, cc, qq, c_mask, q_mask) ** 2).sum()

    def loss_ref(p, cc, qq):
        return (bidaf_apply(p, cc, qq, c_mask, q_mask) ** 2).sum()

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(params, c, q)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(params, c, q)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4)


def test_pallas_lstm_trainable_grads_match_scan(rng):
    """Fused Pallas BPTT VJP == jnp scan autodiff (ragged masks, both
    directions, cotangents on outputs AND final states)."""
    from mmbidaf_tpu.ops.lstm import bilstm_apply, bilstm_init
    from mmbidaf_tpu.ops.pallas.lstm_kernel import bilstm_pallas_trainable

    B, T, in_dim, h = 3, 9, 6, 8
    params = bilstm_init(jax.random.key(7), in_dim, h)
    x = jnp.asarray(rng.standard_normal((B, T, in_dim)).astype(np.float32))
    lengths = np.array([9, 4, 7])
    mask = jnp.asarray((np.arange(T)[None] < lengths[:, None]).astype(np.float32))

    def loss_pl(p, xx):
        out, (h_n, c_n) = bilstm_pallas_trainable(p, xx, mask, interpret=True)
        return (out ** 2).sum() + (h_n * 0.3).sum() + (c_n ** 2).sum()

    def loss_ref(p, xx):
        out, (h_n, c_n) = bilstm_apply(p, xx, mask)
        return (out ** 2).sum() + (h_n * 0.3).sum() + (c_n ** 2).sum()

    # forward parity through the custom-vjp wrapper
    np.testing.assert_allclose(loss_pl(params, x), loss_ref(params, x), rtol=1e-5)

    gp = jax.grad(loss_pl, argnums=(0, 1))(params, x)
    gr = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    flat_p, _ = jax.tree_util.tree_flatten_with_path(gp)
    flat_r = jax.tree.leaves(gr)
    for (path, a), b in zip(flat_p, flat_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_fused_bidaf_dropout_grads_match_jnp(rng):
    """Dropout-training fused kernel (similarity-only dropout via cd/qd
    operands) == jnp bidaf_apply with dropout, forward and grads, given
    identical rng consumption."""
    from mmbidaf_tpu.ops.pallas.bidaf_kernel import bidaf_attention_fused_dropout

    B, T_c, T_q, D = 2, 6, 5, 8
    drop = 0.3
    keep = 1.0 - drop
    params = bidaf_init(jax.random.key(14), D)
    c = jnp.asarray(rng.standard_normal((B, T_c, D)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((B, T_q, D)).astype(np.float32))
    c_mask = jnp.asarray(_ragged_mask(rng, B, T_c))
    q_mask = jnp.asarray(_ragged_mask(rng, B, T_q))
    key = jax.random.key(99)

    def loss_pl(p, cc, qq):
        rc, rq = jax.random.split(key)
        cd = cc * jax.random.bernoulli(rc, keep, cc.shape) / keep
        qd = qq * jax.random.bernoulli(rq, keep, qq.shape) / keep
        return (bidaf_attention_fused_dropout(p, cc, qq, cd, qd, c_mask, q_mask) ** 2).sum()

    def loss_ref(p, cc, qq):
        return (bidaf_apply(p, cc, qq, c_mask, q_mask, drop, key) ** 2).sum()

    np.testing.assert_allclose(
        float(loss_pl(params, c, q)), float(loss_ref(params, c, q)), rtol=1e-5
    )
    gf = jax.grad(loss_pl, argnums=(0, 1, 2))(params, c, q)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(params, c, q)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4)


def test_full_model_dropout_grads_with_pallas_kernels(rng):
    """Full-model grads with Pallas kernels at the DEFAULT drop_prob=0.2 ==
    plain jnp path given the same step rng (dropout rng consumption must
    line up exactly across the dispatch)."""
    import dataclasses

    from mmbidaf_tpu.config import tiny_test_config
    from mmbidaf_tpu.data.synthetic import random_word_vectors, synthetic_batch
    from mmbidaf_tpu.models.mmbidaf import mmbidaf_apply, mmbidaf_init
    from mmbidaf_tpu.train.loop import nll_loss

    cfg = tiny_test_config()
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, drop_prob=0.2))
    cfg_pl = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, use_pallas_attention=True, use_pallas_lstm=True
        ),
    )
    wv = random_word_vectors(rng, cfg.data.vocab_size, cfg.model.emb_dim)
    params = mmbidaf_init(jax.random.key(3), cfg, jnp.asarray(wv))
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(rng, cfg, batch_size=2).items()}
    step_rng = jax.random.key(21)

    def loss(p, c):
        log_p = mmbidaf_apply(p, batch, c, rng=step_rng)
        return nll_loss(log_p, batch["targets"], batch["target_mask"])

    l_ref, g_ref = jax.value_and_grad(lambda p: loss(p, cfg))(params)
    l_pl, g_pl = jax.value_and_grad(lambda p: loss(p, cfg_pl))(params)
    np.testing.assert_allclose(float(l_pl), float(l_ref), rtol=1e-5)
    flat_p, _ = jax.tree_util.tree_flatten_with_path(g_pl)
    for (path, a), b in zip(flat_p, jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_full_model_grads_with_pallas_kernels(rng):
    """jax.grad through the FULL model with Pallas attention + LSTM kernels
    (drop_prob=0 training path) == plain jnp grads (interpret mode)."""
    import dataclasses

    from mmbidaf_tpu.config import tiny_test_config
    from mmbidaf_tpu.data.synthetic import random_word_vectors, synthetic_batch
    from mmbidaf_tpu.models.mmbidaf import mmbidaf_apply, mmbidaf_init
    from mmbidaf_tpu.train.loop import nll_loss

    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, drop_prob=0.0)
    )
    cfg_pl = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, use_pallas_attention=True, use_pallas_lstm=True
        ),
    )
    wv = random_word_vectors(rng, cfg.data.vocab_size, cfg.model.emb_dim)
    params = mmbidaf_init(jax.random.key(2), cfg, jnp.asarray(wv))
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(rng, cfg, batch_size=2).items()}
    step_rng = jax.random.key(11)  # rng present => training path

    def loss(p, c):
        log_p = mmbidaf_apply(p, batch, c, rng=step_rng)
        return nll_loss(log_p, batch["targets"], batch["target_mask"])

    l_ref, g_ref = jax.value_and_grad(lambda p: loss(p, cfg))(params)
    l_pl, g_pl = jax.value_and_grad(lambda p: loss(p, cfg_pl))(params)
    np.testing.assert_allclose(float(l_pl), float(l_ref), rtol=1e-5)
    flat_p, _ = jax.tree_util.tree_flatten_with_path(g_pl)
    for (path, a), b in zip(flat_p, jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_tiled_bidaf_matches_jnp(rng):
    """Blockwise two-pass BiDAF == reference jnp (incl. padding + ragged)."""
    from mmbidaf_tpu.ops.pallas.bidaf_tiled_kernel import bidaf_attention_tiled

    B, T_c, T_q, D = 2, 20, 13, 16
    params = bidaf_init(jax.random.key(6), D)
    c = jnp.asarray(rng.standard_normal((B, T_c, D)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((B, T_q, D)).astype(np.float32))
    c_mask = jnp.asarray(_ragged_mask(rng, B, T_c))
    q_mask = jnp.asarray(_ragged_mask(rng, B, T_q))

    ref = bidaf_apply(params, c, q, c_mask, q_mask)
    tiled = bidaf_attention_tiled(
        params, c, q, c_mask, q_mask, tc_blk=8, tq_blk=8, interpret=True
    )
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(ref), atol=3e-5)


def test_winograd_conv_matches_lax(rng):
    """Winograd F(2x2,3x3) == lax.conv (f32, incl. odd H/W + batch chunking)."""
    from mmbidaf_tpu.ops.winograd import winograd_conv3x3

    for (N, H, W, Cin, Cout) in [(2, 8, 8, 5, 7), (3, 9, 11, 4, 6), (5, 14, 14, 32, 16)]:
        x = jnp.asarray(rng.standard_normal((N, H, W, Cin)).astype(np.float32))
        w = jnp.asarray((rng.standard_normal((3, 3, Cin, Cout)) * 0.2).astype(np.float32))
        b = jnp.asarray(rng.standard_normal(Cout).astype(np.float32))
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + b
        out = winograd_conv3x3(x, w, b)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_winograd_fused_kernel_matches_lax(rng):
    """Fused Pallas Winograd kernel (s2d layout, in-VMEM transforms, 16 MXU
    GEMMs, fused bias+ReLU) == lax.conv, incl. odd H/W and K blocking."""
    from mmbidaf_tpu.ops.pallas.winograd_kernel import winograd_conv3x3_fused

    for (N, H, W, Cin, Cout, kblk) in [
        (2, 8, 8, 128, 128, 128),
        (1, 14, 14, 128, 256, 128),   # K blocked in 2
        (2, 13, 9, 128, 128, 128),    # odd spatial → padded tiles
    ]:
        x = jnp.asarray(rng.standard_normal((N, H, W, Cin)).astype(np.float32))
        w = jnp.asarray((rng.standard_normal((3, 3, Cin, Cout)) * 0.1).astype(np.float32))
        b = jnp.asarray(rng.standard_normal(Cout).astype(np.float32))
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + b
        ref = jnp.maximum(ref, 0.0)
        out = winograd_conv3x3_fused(x, w, b, relu=True, k_block=kblk, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_vgg_winograd_features_close(rng):
    """Full VGG forward with use_winograd_conv == direct-conv forward within
    a feature-level tolerance (frozen featurizer; flag off by default)."""
    from mmbidaf_tpu.ops.vgg import vgg_features, vgg_init

    spec = (32, 32, "M", 64, "M")  # conv2+ have C_in >= 32 -> winograd path
    params = vgg_init(jax.random.key(8), spec, image_size=32, fc_dim=64)
    imgs = jnp.asarray(rng.standard_normal((4, 32, 32, 3)).astype(np.float32))
    ref = vgg_features(params, imgs, spec, winograd=False)
    win = vgg_features(params, imgs, spec, winograd=True)
    np.testing.assert_allclose(np.asarray(win), np.asarray(ref), atol=1e-3, rtol=1e-3)


def test_pallas_conv3x3_matches_lax(rng):
    """im2col conv kernel == lax.conv_general_dilated (SAME, 3x3, ReLU)."""
    from mmbidaf_tpu.ops.pallas.conv_kernel import conv3x3_same

    N, H, W, Cin, Cout = 2, 8, 16, 5, 7
    x = jnp.asarray(rng.standard_normal((N, H, W, Cin)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, Cin, Cout)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.standard_normal(Cout).astype(np.float32))

    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b
    ref = jnp.maximum(ref, 0.0)
    out = conv3x3_same(x, w, b, tile_h=4, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pallas_conv3x3_acc_matches_lax(rng):
    from mmbidaf_tpu.ops.pallas.conv_kernel import conv3x3_same_acc

    N, H, W, Cin, Cout = 2, 8, 16, 5, 7
    x = jnp.asarray(rng.standard_normal((N, H, W, Cin)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, Cin, Cout)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.standard_normal(Cout).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b
    ref = jnp.maximum(ref, 0.0)
    out = conv3x3_same_acc(x, w, b, tile_h=4, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pallas_conv3x3_db_matches_lax(rng):
    from mmbidaf_tpu.ops.pallas.conv_kernel import conv3x3_same_db

    N, H, W, Cin, Cout = 2, 12, 16, 5, 7
    x = jnp.asarray(rng.standard_normal((N, H, W, Cin)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, Cin, Cout)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.standard_normal(Cout).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b
    ref = jnp.maximum(ref, 0.0)
    out = conv3x3_same_db(x, w, b, tile_h=4, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_mfcc_path_matches_jnp(rng):
    """fused=True waveform_to_features (mel through the Pallas pass, dB/DCT
    tail in jnp) == the plain matmul-DFT path, for mfcc and logmel."""
    sr, n_fft, win, hop, T = 16000, 64, 48, 16, 32
    consts = audio.make_audio_frontend_consts(sr, n_fft, win, 12, 8)
    sig = jnp.asarray(
        rng.standard_normal((2, T * hop + win)).astype(np.float32)
    )
    for feature in ("mfcc", "logmel"):
        ref = audio.waveform_to_features(sig, consts, win, hop, T, feature=feature)
        fused = audio.waveform_to_features(
            sig, consts, win, hop, T, feature=feature, fused=True
        )
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(ref), rtol=2e-4, atol=1e-5,
            err_msg=feature,
        )


def test_frontend_uses_fused_melspec_flag(rng):
    """apply_frontend with use_pallas_melspec produces the same features."""
    import dataclasses

    from mmbidaf_tpu.config import tiny_test_config
    from mmbidaf_tpu.data.frontend import apply_frontend, frontend_init
    from mmbidaf_tpu.ops.vgg import TINY_SPEC

    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, img_feat_dim=32,
                                       audio_feat_dim=cfg.data.n_mfcc)
    )
    d = cfg.data
    fe = frontend_init(jax.random.key(0), cfg, vgg_spec=TINY_SPEC)
    n = d.max_audio_frames * d.hop_length + d.win_length
    raw = {
        "waveform": jnp.asarray(rng.standard_normal((2, n)).astype(np.float32)),
        "aud_mask": jnp.ones((2, d.max_audio_frames), jnp.float32),
    }
    ref = apply_frontend(fe, raw, cfg, TINY_SPEC)
    cfg_f = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, use_pallas_melspec=True)
    )
    fused = apply_frontend(fe, raw, cfg_f, TINY_SPEC)
    np.testing.assert_allclose(
        np.asarray(fused["audio"]), np.asarray(ref["audio"]), rtol=2e-4, atol=1e-5
    )


def test_fused_preprocess_matches_jnp(rng):
    """One-pass preprocess kernel (u8 convert + both resize GEMMs + ImageNet
    normalization) == ops.vgg.preprocess_frames, incl. the identity-resize
    edge and non-divisible source sizes."""
    from mmbidaf_tpu.ops.pallas.preprocess_kernel import preprocess_frames_fused
    from mmbidaf_tpu.ops.vgg import preprocess_frames

    for n, h, w, s in [(3, 48, 64, 32), (2, 32, 20, 32)]:
        x = jnp.asarray(rng.integers(0, 256, (n, h, w, 3)).astype(np.uint8))
        ref = preprocess_frames(x, s, dtype=jnp.float32)
        out = preprocess_frames_fused(x, s, dtype=jnp.float32, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    # bf16 output: the kernel computes in f32 and casts once at the end —
    # compare against the f32 reference at bf16-rounding tolerance.
    x = jnp.asarray(rng.integers(0, 256, (2, 48, 64, 3)).astype(np.uint8))
    ref = preprocess_frames(x, 32, dtype=jnp.float32)
    out = preprocess_frames_fused(x, 32, dtype=jnp.bfloat16, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out).astype(np.float32), np.asarray(ref), atol=3e-2
    )
