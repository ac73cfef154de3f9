"""Tensor-parallel VGG classifier (SURVEY §3.3 TP row, delivered as an
option): ``MeshConfig.num_model > 1`` adds an innermost 'model' mesh axis and
``tp_vgg`` shards the frontend's fc1 column-parallel / fc2 row-parallel over
it (Megatron split, pure GSPMD annotations — XLA inserts the single
all-reduce after fc2). These tests pin, on the 8-device CPU mesh:

- mesh factory: axis order/shape, and that batch sharding skips 'model';
- ``shard_frontend`` placement: fc weights sharded, towers/convs replicated;
- numerics: the TP frontend == the replicated frontend, end to end;
- serving: ``Summarizer`` with ``tp_vgg`` (with and without DP) == plain;
- every misconfiguration raises with an actionable message.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from mmbidaf_tpu.config import MeshConfig, tiny_test_config
from mmbidaf_tpu.data.frontend import apply_frontend, frontend_init
from mmbidaf_tpu.data.synthetic import synthetic_batch
from mmbidaf_tpu.ops.vgg import TINY_SPEC
from mmbidaf_tpu.parallel import batch_sharding, make_mesh, shard_frontend


def _cfg(img_feat_dim=32, **mesh_kw):
    cfg = tiny_test_config()
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, img_feat_dim=img_feat_dim, audio_feat_dim=cfg.data.n_mfcc
        ),
        mesh=MeshConfig(**mesh_kw),
    )


def _raw_batch(rng, cfg, B=2):
    d = cfg.data
    base = synthetic_batch(rng, cfg, batch_size=B)
    n_samples = d.max_audio_frames * d.hop_length + d.win_length
    return {
        "targets": base["targets"],
        "target_mask": base["target_mask"],
        "text_ids": base["text_ids"],
        "word_mask": base["word_mask"],
        "sent_mask": base["sent_mask"],
        "img_mask": base["img_mask"],
        "aud_mask": base["aud_mask"],
        "frames": (rng.random((B, d.max_keyframes, 24, 20, 3)) * 255).astype(
            np.uint8
        ),
        "waveform": rng.standard_normal((B, n_samples)).astype(np.float32) * 0.1,
    }


def _tp_mesh(num_data=4, num_model=2):
    if jax.device_count() < num_data * num_model:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(MeshConfig(num_data=num_data, num_model=num_model))


def test_tp_mesh_factory_and_batch_axes():
    mesh = _tp_mesh()
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.shape == (4, 2)
    # the batch never shards over the TP axis
    assert batch_sharding(mesh).spec == P(("data",))


def test_shard_frontend_placement():
    cfg = _cfg()
    mesh = _tp_mesh()
    fe = frontend_init(jax.random.key(0), cfg, vgg_spec=TINY_SPEC)
    out = shard_frontend(fe, mesh, tp_vgg=True)
    vgg = out["vgg"]
    assert vgg["fc1_w"].sharding.spec == P(None, "model")
    assert vgg["fc1_b"].sharding.spec == P("model")
    assert vgg["fc2_w"].sharding.spec == P("model", None)
    # fc2_b and the conv stack stay replicated
    assert vgg["fc2_b"].sharding.is_fully_replicated
    conv_leaves = jax.tree.leaves(
        {k: v for k, v in vgg.items() if k not in
         ("fc1_w", "fc1_b", "fc2_w", "fc2_b")}
    )
    assert conv_leaves and all(
        leaf.sharding.is_fully_replicated for leaf in conv_leaves
    )
    # non-VGG frontend leaves (audio consts) replicate too
    for k, sub in out.items():
        if k != "vgg":
            assert all(
                leaf.sharding.is_fully_replicated for leaf in jax.tree.leaves(sub)
            )


def test_shard_frontend_errors():
    cfg = _cfg()
    fe = frontend_init(jax.random.key(0), cfg, vgg_spec=TINY_SPEC)
    no_model = make_mesh(MeshConfig(num_data=8))
    with pytest.raises(ValueError, match="num_model"):
        shard_frontend(fe, no_model, tp_vgg=True)
    mesh = _tp_mesh()
    fe_odd = frontend_init(
        jax.random.key(0), _cfg(img_feat_dim=33), vgg_spec=TINY_SPEC
    )
    with pytest.raises(ValueError, match="divide"):
        shard_frontend(fe_odd, mesh, tp_vgg=True)
    with pytest.raises(ValueError, match="image tower"):
        shard_frontend({"audio": fe["audio"]} if "audio" in fe else {}, mesh,
                       tp_vgg=True)


def test_tp_frontend_matches_replicated(rng):
    cfg = _cfg()
    fe = frontend_init(jax.random.key(3), cfg, vgg_spec=TINY_SPEC)
    raw = {k: jnp.asarray(v) for k, v in _raw_batch(rng, cfg).items()}
    want = jax.jit(
        lambda p, b: apply_frontend(p, b, cfg, vgg_spec=TINY_SPEC)
    )(fe, raw)

    mesh = _tp_mesh()
    fe_tp = shard_frontend(fe, mesh, tp_vgg=True)
    got = jax.jit(
        lambda p, b: apply_frontend(p, b, cfg, vgg_spec=TINY_SPEC)
    )(fe_tp, raw)
    for k in ("images", "audio"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), atol=2e-5,
            err_msg=f"TP frontend diverges on {k}",
        )


def test_tp_train_step_matches_replicated(rng):
    """The raw-batch train step (frozen frontend inside the jit) produces
    the same loss whether the VGG classifier is replicated or TP-sharded —
    the train.py surface of the flag."""
    from mmbidaf_tpu.data.synthetic import random_word_vectors
    from mmbidaf_tpu.models.mmbidaf import mmbidaf_init
    from mmbidaf_tpu.parallel import shard_batch, shard_params
    from mmbidaf_tpu.train.loop import init_train_state, make_train_step

    cfg = _cfg()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, optimizer="adam", lr=1e-3)
    )
    wv = random_word_vectors(rng, cfg.data.vocab_size, cfg.model.emb_dim)
    params = mmbidaf_init(jax.random.key(4), cfg, jnp.asarray(wv))
    fe = frontend_init(jax.random.key(5), cfg, vgg_spec=TINY_SPEC)
    raw = {k: jnp.asarray(v) for k, v in _raw_batch(rng, cfg, B=4).items()}

    # The train step donates its state, and the two states share buffers
    # (params, plus JAX's cached constant scalars inside the fresh opt
    # state) — deep-copy each state so donation can't delete the other's.
    def fresh(state):
        return jax.tree.map(jnp.copy, state)

    mesh = _tp_mesh()
    state_tp = init_train_state(
        jax.random.key(6), shard_params(params, mesh), cfg
    )
    step = make_train_step(cfg, fe_params=fe, vgg_spec=TINY_SPEC)
    _, m_ref = step(fresh(init_train_state(jax.random.key(6), params, cfg)), raw)

    fe_tp = shard_frontend(fe, mesh, tp_vgg=True)
    step_tp = make_train_step(cfg, fe_params=fe_tp, vgg_spec=TINY_SPEC)
    _, m_tp = step_tp(fresh(state_tp), shard_batch(raw, mesh))
    np.testing.assert_allclose(
        float(m_tp["loss"]), float(m_ref["loss"]), rtol=1e-5
    )


def test_summarizer_tp_validation():
    from mmbidaf_tpu.serving import Summarizer

    cfg = _cfg(num_data=1, num_model=2, tp_vgg=True)
    no_img = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, use_images=False)
    )
    with pytest.raises(ValueError, match="image tower"):
        Summarizer.init_random(no_img, vgg_spec=TINY_SPEC)
    flat = dataclasses.replace(cfg, mesh=MeshConfig(num_data=2, tp_vgg=True))
    with pytest.raises(ValueError, match="num_model"):
        Summarizer.init_random(flat, vgg_spec=TINY_SPEC)


def test_sp_audio_with_tp_needs_explicit_seq_axis():
    """sp_audio + a 'model' axis but num_seq=1: the pure-SP last-axis
    fallback would shard audio frames over the TP weight axis — it must
    raise instead (train.py guards this; sp_axes now guards serving too)."""
    from mmbidaf_tpu.parallel.sp_tower import sp_axes

    cfg = dataclasses.replace(
        _cfg(), mesh=MeshConfig(num_data=4, num_model=2,
                                tp_vgg=True, sp_audio=True)
    )
    mesh = make_mesh(cfg.mesh)
    with pytest.raises(ValueError, match="num_seq"):
        sp_axes(mesh, cfg)


def test_from_run_mesh_overrides(tmp_path):
    """from_run(mesh_overrides=...) rewrites the saved MeshConfig — the
    deploy-time knob tools/serve.py's --tp_vgg/--num_model ride on. A run
    dir with a config but no checkpoint exercises the override plumbing up
    to the (expected) missing-checkpoint error; a bogus key fails fast."""
    from mmbidaf_tpu.serving import Summarizer
    from mmbidaf_tpu.train.checkpoint import save_config

    run = tmp_path / "run"
    save_config(str(run), _cfg())
    with pytest.raises(TypeError):
        Summarizer.from_run(str(run), mesh_overrides={"bogus_axis": 3})
    with pytest.raises(FileNotFoundError, match="vocab.json"):
        Summarizer.from_run(
            str(run), mesh_overrides={"tp_vgg": True, "num_model": 2}
        )
