"""Stacked BiLSTM (`num_rnn_layers` > 1) — parity with torch nn.LSTM stacks.

The reference ``RNNEncoder`` exposes a ``num_layers`` knob (nn.LSTM stacking
with inter-layer dropout, SURVEY.md §3.1); these tests prove the rebuild's
equivalent: ``stacked_bilstm_init/apply`` (ops/lstm.py), the
``ModelConfig.num_rnn_layers`` wiring through the full model, the
``_l{k}``-aware checkpoint port/export, and the fused-Pallas-per-layer path.
"""

import dataclasses

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mmbidaf_tpu.config import tiny_test_config
from mmbidaf_tpu.data.synthetic import random_word_vectors, synthetic_batch
from mmbidaf_tpu.interop.torch_port import export_mmbidaf, port_bilstm, port_mmbidaf
from mmbidaf_tpu.models.mmbidaf import mmbidaf_apply, mmbidaf_decode, mmbidaf_init
from mmbidaf_tpu.ops.lstm import (
    bilstm_apply,
    stacked_bilstm_apply,
    stacked_bilstm_init,
)
from tests.oracles import torch_model as oracle

ATOL = 5e-5


def _sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _ragged_mask(rng, B, T, min_len=1):
    lengths = rng.integers(min_len, T + 1, size=B)
    lengths[0] = T
    mask = (np.arange(T)[None, :] < lengths[:, None]).astype(np.float32)
    return mask, lengths


def _stacked_cfg(num_layers, **kw):
    cfg = tiny_test_config(**kw)
    return dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, num_rnn_layers=num_layers)
    )


@pytest.mark.parametrize("num_layers", [2, 3])
def test_stacked_bilstm_matches_torch_ragged(rng, num_layers):
    """L-deep BiLSTM vs torch nn.LSTM(num_layers=L) + pack_padded_sequence."""
    torch.manual_seed(20 + num_layers)
    in_dim, hidden, B, T = 11, 7, 5, 9
    tenc = oracle.RNNEncoder(in_dim, hidden, num_layers).eval()
    params = port_bilstm(_sd(tenc), "rnn")
    assert len(params["layers"]) == num_layers

    x = rng.standard_normal((B, T, in_dim)).astype(np.float32)
    mask, lengths = _ragged_mask(rng, B, T)

    out, (h_n, c_n) = bilstm_apply(params, jnp.asarray(x), jnp.asarray(mask))
    tout, (th_n, tc_n) = tenc(torch.from_numpy(x), torch.from_numpy(lengths))

    np.testing.assert_allclose(np.asarray(out), tout.detach().numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(h_n), th_n.detach().numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(c_n), tc_n.detach().numpy(), atol=ATOL)


def test_stacked_init_shapes_and_single_layer_passthrough(rng):
    """Layer 0 takes in_dim, deeper layers 2h; num_layers=1 returns the flat
    pytree (same structure + same rng consumption as bilstm_init)."""
    key = jax.random.key(0)
    p1 = stacked_bilstm_init(key, 5, 4, 1)
    assert set(p1) == {"fwd", "bwd"}
    from mmbidaf_tpu.ops.lstm import bilstm_init

    ref = bilstm_init(key, 5, 4)
    np.testing.assert_array_equal(np.asarray(p1["fwd"]["w_x"]), np.asarray(ref["fwd"]["w_x"]))

    p3 = stacked_bilstm_init(key, 5, 4, 3)
    assert [lp["fwd"]["w_x"].shape for lp in p3["layers"]] == [(5, 16), (8, 16), (8, 16)]
    with pytest.raises(ValueError):
        stacked_bilstm_init(key, 5, 4, 0)


def test_stacked_interlayer_dropout_semantics(rng):
    """drop>0 + rng perturbs (training); rng=None is the exact eval path."""
    params = stacked_bilstm_init(jax.random.key(1), 6, 5, 2)
    x = jnp.asarray(rng.standard_normal((3, 7, 6)).astype(np.float32))
    mask = jnp.asarray(_ragged_mask(rng, 3, 7)[0])
    out_eval, _ = stacked_bilstm_apply(params, x, mask)
    out_nodrop, _ = stacked_bilstm_apply(params, x, mask, drop_prob=0.5, rng=None)
    np.testing.assert_array_equal(np.asarray(out_eval), np.asarray(out_nodrop))
    out_drop, _ = stacked_bilstm_apply(
        params, x, mask, drop_prob=0.5, rng=jax.random.key(2)
    )
    assert not np.allclose(np.asarray(out_eval), np.asarray(out_drop))
    # padded positions stay zero either way
    pad = np.asarray(mask)[:, :, None] == 0
    assert (np.asarray(out_drop)[np.broadcast_to(pad, out_drop.shape)] == 0).all()


def test_stacked_model_parity_teacher_forcing():
    """Full trimodal model with num_rnn_layers=2 == torch oracle, via port."""
    cfg = _stacked_cfg(2)
    rng = np.random.default_rng(31)
    wv = random_word_vectors(rng, cfg.data.vocab_size, cfg.model.emb_dim)
    torch.manual_seed(31)
    tm = oracle.MMBiDAF(
        torch.from_numpy(wv),
        cfg.model.hidden_size,
        img_feat_dim=cfg.model.img_feat_dim,
        audio_feat_dim=cfg.model.audio_feat_dim,
        num_decode_steps=cfg.model.max_decode_steps,
        num_rnn_layers=2,
    ).eval()
    params = port_mmbidaf(_sd(tm), use_images=True, use_audio=True)
    assert "layers" in params["word_lstm"] and len(params["word_lstm"]["layers"]) == 2

    batch = synthetic_batch(rng, cfg, batch_size=3)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    log_p = mmbidaf_apply(params, jbatch, cfg)
    with torch.no_grad():
        tlog_p, _ = tm(
            text_ids=torch.from_numpy(batch["text_ids"]).long(),
            word_mask=torch.from_numpy(batch["word_mask"]),
            sent_mask=torch.from_numpy(batch["sent_mask"]),
            targets=torch.from_numpy(batch["targets"]).long(),
            images=torch.from_numpy(batch["images"]),
            img_mask=torch.from_numpy(batch["img_mask"]),
            audio=torch.from_numpy(batch["audio"]),
            aud_mask=torch.from_numpy(batch["aud_mask"]),
        )
    valid = np.broadcast_to(batch["sent_mask"][:, None, :] > 0, tlog_p.shape)
    np.testing.assert_allclose(
        np.asarray(log_p)[valid], tlog_p.numpy()[valid], atol=ATOL
    )


def test_stacked_export_import_roundtrip():
    """export_mmbidaf → port_mmbidaf identity on a 2-layer pytree, and the
    exported ``_l1`` keys load into the torch oracle with strict key match."""
    cfg = _stacked_cfg(2)
    rng = np.random.default_rng(33)
    wv = random_word_vectors(rng, cfg.data.vocab_size, cfg.model.emb_dim)
    params = mmbidaf_init(jax.random.key(33), cfg, jnp.asarray(wv))
    sd = export_mmbidaf(params)
    assert "word_enc.rnn.weight_ih_l1" in sd
    params2 = port_mmbidaf(sd, use_images=True, use_audio=True)
    flat2 = dict(jax.tree_util.tree_leaves_with_path(params2))
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat2[path]), atol=1e-6, err_msg=str(path)
        )
    tm = oracle.MMBiDAF(
        torch.from_numpy(wv), cfg.model.hidden_size,
        img_feat_dim=cfg.model.img_feat_dim,
        audio_feat_dim=cfg.model.audio_feat_dim,
        num_rnn_layers=2,
    )
    missing, unexpected = tm.load_state_dict(
        {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}, strict=False
    )
    assert not unexpected, f"unexpected keys: {unexpected}"
    assert not missing, f"missing keys: {missing}"


def test_stacked_pallas_path_matches_plain():
    """num_rnn_layers=2 + use_pallas_lstm: the fused kernel loops per layer
    (interpret mode on CPU) and matches the plain scan model end to end."""
    cfg = _stacked_cfg(2)
    cfg_pl = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, use_pallas_lstm=True)
    )
    rng = np.random.default_rng(37)
    wv = random_word_vectors(rng, cfg.data.vocab_size, cfg.model.emb_dim)
    params = mmbidaf_init(jax.random.key(37), cfg, jnp.asarray(wv))
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(rng, cfg, batch_size=2).items()}
    lp_plain, picks_plain = mmbidaf_decode(params, batch, cfg)
    lp_pl, picks_pl = mmbidaf_decode(params, batch, cfg_pl)
    np.testing.assert_array_equal(np.asarray(picks_plain), np.asarray(picks_pl))
    np.testing.assert_allclose(np.asarray(lp_plain), np.asarray(lp_pl), atol=1e-5)


def test_stacked_aot_export_roundtrip(tmp_path):
    """AOT artifact export (mmbidaf_tpu/export.py) composes with stacked
    params: the flat-leaf program freezes the nested {"layers": [...]}
    pytree and the reloaded artifact reproduces the live decode exactly."""
    from mmbidaf_tpu.export import ExportedDecoder, export_summarizer
    from mmbidaf_tpu.ops.vgg import TINY_SPEC
    from mmbidaf_tpu.serving import Summarizer
    from tests.test_export import make_cfg, random_raw

    cfg = make_cfg()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, num_rnn_layers=2)
    )
    summ = Summarizer.init_random(cfg, seed=5, vgg_spec=TINY_SPEC)
    assert "layers" in summ.params["word_lstm"]
    out = str(tmp_path / "stacked_artifact")
    export_summarizer(summ, out, batch_size=2, frame_hw=(12, 16))

    dec = ExportedDecoder(out)
    rng = np.random.default_rng(43)
    raw = random_raw(cfg, rng, batch=2, frame_hw=(12, 16))
    log_p, picks = dec.decode_raw(raw)
    live_lp, live_picks = summ._decode(
        summ.params, summ.fe_params, {k: jnp.asarray(v) for k, v in raw.items()}
    )
    np.testing.assert_array_equal(picks, np.asarray(live_picks))
    np.testing.assert_allclose(log_p, np.asarray(live_lp), rtol=0, atol=0)


def test_stacked_grads_flow_through_all_layers():
    """Every stacked layer's weights get a nonzero gradient (no dead layers)."""
    cfg = _stacked_cfg(2, use_images=False, use_audio=False)
    rng = np.random.default_rng(41)
    wv = random_word_vectors(rng, cfg.data.vocab_size, cfg.model.emb_dim)
    params = mmbidaf_init(jax.random.key(41), cfg, jnp.asarray(wv))
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(rng, cfg, batch_size=2).items()}

    def loss_fn(p):
        log_p = mmbidaf_apply(p, batch, cfg)
        tgt = batch["targets"]
        picked = jnp.take_along_axis(log_p, tgt[:, :, None], axis=2)
        return -picked.mean()

    grads = jax.grad(loss_fn)(params)
    for name in ("word_lstm", "sent_lstm", "model_lstm"):
        for i, lp in enumerate(grads[name]["layers"]):
            norm = float(jnp.linalg.norm(lp["fwd"]["w_x"]))
            assert norm > 0, f"{name} layer {i} got zero gradient"


def test_stacked_sp_audio_tower_matches_local(eight_device_mesh):
    """MeshConfig.sp_audio × num_rnn_layers=2: the SP tower runs every
    stacked aud_lstm layer on the still-sharded frame axis
    (parallel/sp_tower.py) and the flag-driven decode matches the local
    program exactly — the stacked-encoder composition of
    tests/test_sp_product.py's flag-on == flag-off contract."""
    del eight_device_mesh
    from mmbidaf_tpu.data.frontend import make_end_to_end_decode
    from mmbidaf_tpu.ops.vgg import TINY_SPEC
    from mmbidaf_tpu.parallel import make_mesh, make_sp_audio_tower
    from tests.test_sp_product import _raw_batch, _sp_config

    rng = np.random.default_rng(77)
    cfg = _sp_config(num_rnn_layers=2)
    mesh = make_mesh(cfg.mesh)
    wv = random_word_vectors(rng, cfg.data.vocab_size, cfg.model.emb_dim)
    params = mmbidaf_init(jax.random.key(11), cfg, jnp.asarray(wv))
    assert len(params["aud_lstm"]["layers"]) == 2

    from mmbidaf_tpu.data.frontend import frontend_init

    fe = frontend_init(jax.random.key(12), cfg, vgg_spec=TINY_SPEC)
    raw = _raw_batch(rng, cfg)

    tower = make_sp_audio_tower(mesh, cfg)
    lp_sp, picks_sp = make_end_to_end_decode(
        cfg, vgg_spec=TINY_SPEC, audio_g_fn=tower
    )(params, fe, raw)
    lp_l, picks_l = make_end_to_end_decode(cfg, vgg_spec=TINY_SPEC)(params, fe, raw)
    np.testing.assert_array_equal(np.asarray(picks_sp), np.asarray(picks_l))
    np.testing.assert_allclose(
        np.asarray(lp_sp), np.asarray(lp_l), rtol=2e-4, atol=2e-5
    )
