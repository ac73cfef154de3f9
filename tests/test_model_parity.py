"""End-to-end model parity: torch oracle MMBiDAF vs jitted JAX forward.

This is the checkpoint-parity contract (SURVEY.md §1 / BASELINE.md row 4):
given the same weights (ported via ``port_mmbidaf``), the JAX forward must
reproduce the torch forward to fp32 tolerance — including ragged masks,
teacher forcing, greedy decode, and all tower subsets.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from mmbidaf_tpu.config import tiny_test_config
from mmbidaf_tpu.data.synthetic import random_word_vectors, synthetic_batch
from mmbidaf_tpu.interop.torch_port import port_mmbidaf
from mmbidaf_tpu.models.mmbidaf import mmbidaf_apply, mmbidaf_decode
from tests.oracles import torch_model as oracle

ATOL = 5e-5


def _build_pair(use_images, use_audio, seed=0):
    cfg = tiny_test_config(use_images=use_images, use_audio=use_audio)
    rng = np.random.default_rng(seed)
    wv = random_word_vectors(rng, cfg.data.vocab_size, cfg.model.emb_dim)
    torch.manual_seed(seed)
    tm = oracle.MMBiDAF(
        torch.from_numpy(wv),
        cfg.model.hidden_size,
        img_feat_dim=cfg.model.img_feat_dim if use_images else None,
        audio_feat_dim=cfg.model.audio_feat_dim if use_audio else None,
        num_decode_steps=cfg.model.max_decode_steps,
        mask_selected=cfg.model.mask_selected,
    ).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = port_mmbidaf(sd, use_images=use_images, use_audio=use_audio)
    batch = synthetic_batch(rng, cfg, batch_size=3)
    return cfg, tm, params, batch


def _torch_inputs(batch, use_images, use_audio, with_targets):
    kw = dict(
        text_ids=torch.from_numpy(batch["text_ids"]).long(),
        word_mask=torch.from_numpy(batch["word_mask"]),
        sent_mask=torch.from_numpy(batch["sent_mask"]),
    )
    if with_targets:
        kw["targets"] = torch.from_numpy(batch["targets"]).long()
    if use_images:
        kw["images"] = torch.from_numpy(batch["images"])
        kw["img_mask"] = torch.from_numpy(batch["img_mask"])
    if use_audio:
        kw["audio"] = torch.from_numpy(batch["audio"])
        kw["aud_mask"] = torch.from_numpy(batch["aud_mask"])
    return kw


@pytest.mark.parametrize(
    "use_images,use_audio",
    [(True, True), (True, False), (False, True), (False, False)],
    ids=["trimodal", "text+image", "text+audio", "text-only"],
)
def test_forward_parity_teacher_forcing(use_images, use_audio):
    cfg, tm, params, batch = _build_pair(use_images, use_audio)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}

    log_p = mmbidaf_apply(params, jbatch, cfg)
    with torch.no_grad():
        tlog_p, _ = tm(**_torch_inputs(batch, use_images, use_audio, with_targets=True))

    valid = (batch["sent_mask"][:, None, :] > 0) & np.broadcast_to(
        True, tlog_p.shape
    )
    ours = np.asarray(log_p)
    theirs = tlog_p.numpy()
    np.testing.assert_allclose(ours[valid], theirs[valid], atol=ATOL)


def test_greedy_decode_parity():
    cfg, tm, params, batch = _build_pair(True, True, seed=3)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    log_p, picks = mmbidaf_decode(params, jbatch, cfg)
    with torch.no_grad():
        tlog_p, tpicks = tm(**_torch_inputs(batch, True, True, with_targets=False))
    np.testing.assert_array_equal(np.asarray(picks), tpicks.numpy())
    valid = batch["sent_mask"][:, None, :] > 0
    valid = np.broadcast_to(valid, tlog_p.shape)
    np.testing.assert_allclose(
        np.asarray(log_p)[valid], tlog_p.numpy()[valid], atol=ATOL
    )


def test_selected_sentences_not_repicked():
    """With mask_selected=True greedy decode never picks the same sentence twice."""
    cfg, tm, params, batch = _build_pair(True, True, seed=7)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    _, picks = mmbidaf_decode(params, jbatch, cfg)
    picks = np.asarray(picks)
    for row in picks:
        assert len(set(row.tolist())) == len(row)


def test_topk_decode_valid_and_stochastic():
    """top-k decode picks valid, unrepeated sentences and differs across rngs."""
    import jax

    from mmbidaf_tpu.models.mmbidaf import mmbidaf_decode

    cfg, tm, params, batch = _build_pair(True, True, seed=9)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    _, picks_a = mmbidaf_decode(params, jbatch, cfg, mode="topk", topk=3, rng=jax.random.key(0))
    _, picks_b = mmbidaf_decode(params, jbatch, cfg, mode="topk", topk=3, rng=jax.random.key(1))
    n_valid = batch["sent_mask"].sum(axis=1)
    assert (np.asarray(picks_a) < n_valid[:, None]).all()
    for row in np.asarray(picks_a):
        assert len(set(row.tolist())) == len(row)  # mask_selected respected
    # different seeds should usually differ somewhere
    assert not np.array_equal(np.asarray(picks_a), np.asarray(picks_b))
    # topk=1 degenerates to greedy
    _, greedy = mmbidaf_decode(params, jbatch, cfg)
    _, top1 = mmbidaf_decode(params, jbatch, cfg, mode="topk", topk=1, rng=jax.random.key(2))
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(top1))


def test_export_then_import_roundtrip():
    """export_mmbidaf → port_mmbidaf is the identity on the params pytree,
    and the exported state_dict loads into the torch oracle cleanly."""
    import jax as _jax
    import torch as _torch

    from mmbidaf_tpu.config import tiny_test_config
    from mmbidaf_tpu.data.synthetic import random_word_vectors
    from mmbidaf_tpu.interop.torch_port import export_mmbidaf, port_mmbidaf
    from mmbidaf_tpu.models.mmbidaf import mmbidaf_init

    cfg = tiny_test_config()
    rng = np.random.default_rng(5)
    wv = random_word_vectors(rng, cfg.data.vocab_size, cfg.model.emb_dim)
    params = mmbidaf_init(_jax.random.key(5), cfg, jnp.asarray(wv))
    sd = export_mmbidaf(params)
    params2 = port_mmbidaf(sd, use_images=True, use_audio=True)
    flat1 = _jax.tree_util.tree_leaves_with_path(params)
    flat2 = dict(_jax.tree_util.tree_leaves_with_path(params2))
    # build path->leaf maps and compare
    for path, leaf in flat1:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(dict(flat2)[path]), atol=1e-6,
            err_msg=str(path),
        )
    # exported dict loads into the torch oracle (strict key match)
    tm = oracle.MMBiDAF(
        torch.from_numpy(wv), cfg.model.hidden_size,
        img_feat_dim=cfg.model.img_feat_dim, audio_feat_dim=cfg.model.audio_feat_dim,
    )
    missing, unexpected = tm.load_state_dict(
        {k: _torch.from_numpy(np.array(v)) for k, v in sd.items()}, strict=False
    )
    assert not unexpected, f"unexpected keys: {unexpected}"
    assert not missing, f"missing keys: {missing}"


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_decode_picks_always_valid_random_configs(seed):
    """Property test: for random tiny configs + ragged batches, greedy picks
    are always valid unmasked sentence indices."""
    import dataclasses

    import jax

    from mmbidaf_tpu.config import tiny_test_config
    from mmbidaf_tpu.data.synthetic import random_word_vectors, synthetic_batch
    from mmbidaf_tpu.models.mmbidaf import mmbidaf_decode, mmbidaf_init

    rng = np.random.default_rng(seed)
    cfg = tiny_test_config(hidden_size=int(rng.integers(8, 24)))
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model,
            max_decode_steps=int(rng.integers(1, 4)),
            use_images=bool(rng.integers(0, 2)),
            use_audio=bool(rng.integers(0, 2)),
        ),
    )
    wv = random_word_vectors(rng, cfg.data.vocab_size, cfg.model.emb_dim)
    params = mmbidaf_init(jax.random.key(seed), cfg, jnp.asarray(wv))
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(rng, cfg, batch_size=3).items()}
    _, picks = mmbidaf_decode(params, batch, cfg)
    n_valid = np.asarray(batch["sent_mask"]).sum(axis=1)
    assert (np.asarray(picks) < n_valid[:, None]).all()
    assert (np.asarray(picks) >= 0).all()
