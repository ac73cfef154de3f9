"""Product-path wiring of the sharded audio tower (MeshConfig.sp_audio).

Round-2 review: the SP chain (SP-MFCC → SP-BiLSTM → ring BiDAF) existed as
modules proven in tests/dryrun but no config flag could reach it. These
tests drive the FLAG-DRIVEN path — the same builders train.py / infer.py /
serving use — and assert flag-on == flag-off numerically on the 8-device
CPU mesh (SURVEY §3.3 SP row, config-5-style)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmbidaf_tpu.config import MeshConfig, tiny_test_config
from mmbidaf_tpu.data.frontend import apply_frontend, frontend_init, make_end_to_end_decode
from mmbidaf_tpu.data.synthetic import random_word_vectors
from mmbidaf_tpu.models.mmbidaf import mmbidaf_apply, mmbidaf_init
from mmbidaf_tpu.ops.vgg import TINY_SPEC
from mmbidaf_tpu.parallel import make_mesh, make_sp_audio_tower
from mmbidaf_tpu.train.loop import nll_loss


def _sp_config(num_data=2, num_seq=4, **model_over):
    cfg = tiny_test_config()
    return dataclasses.replace(
        cfg,
        # frame bucket must divide the seq axis; raw path: feat dim = n_mfcc
        data=dataclasses.replace(cfg.data, max_audio_frames=16),
        model=dataclasses.replace(
            cfg.model, audio_feat_dim=cfg.data.n_mfcc, **model_over
        ),
        mesh=MeshConfig(num_data=num_data, num_seq=num_seq, sp_audio=True),
    )


def _raw_batch(rng, cfg, B=4):
    d = cfg.data
    n_samples = d.max_audio_frames * d.hop_length + d.win_length
    raw = {
        "text_ids": rng.integers(
            2, d.vocab_size, (B, d.max_sentences, d.max_words)
        ).astype(np.int32),
        "word_mask": np.ones((B, d.max_sentences, d.max_words), np.float32),
        "sent_mask": np.ones((B, d.max_sentences), np.float32),
        "frames": (rng.random((B, d.max_keyframes, 48, 64, 3)) * 255).astype(np.uint8),
        "img_mask": np.ones((B, d.max_keyframes), np.float32),
        "waveform": (rng.standard_normal((B, n_samples)) * 0.1).astype(np.float32),
        "aud_mask": np.ones((B, d.max_audio_frames), np.float32),
    }
    # ragged audio: last example uses only 3/4 of the frames
    raw["aud_mask"][-1, 3 * d.max_audio_frames // 4:] = 0.0
    raw["waveform"][-1, 3 * (n_samples // 4):] = 0.0
    return {k: jnp.asarray(v) for k, v in raw.items()}


@pytest.fixture(scope="module")
def setup(eight_device_mesh):
    del eight_device_mesh  # ensures the 8-device backend
    # module-scoped fixtures need their own generator (the function-scoped
    # conftest rng can't be requested from module scope)
    rng = np.random.default_rng(224)
    cfg = _sp_config()
    mesh = make_mesh(cfg.mesh)
    wv = random_word_vectors(rng, cfg.data.vocab_size, cfg.model.emb_dim)
    params = mmbidaf_init(jax.random.key(0), cfg, jnp.asarray(wv))
    fe = frontend_init(jax.random.key(1), cfg, vgg_spec=TINY_SPEC)
    return cfg, mesh, params, fe, _raw_batch(rng, cfg)


def test_mesh_factory_seq_axis(eight_device_mesh):
    del eight_device_mesh
    mesh = make_mesh(MeshConfig(num_data=2, num_seq=4))
    assert mesh.axis_names == ("data", "seq")
    assert mesh.shape["data"] == 2 and mesh.shape["seq"] == 4
    # batch sharding must skip the seq axis
    from mmbidaf_tpu.parallel import batch_sharding

    assert batch_sharding(mesh).spec == jax.sharding.PartitionSpec(("data",))
    # num_data=-1 fills the remainder
    mesh2 = make_mesh(MeshConfig(num_seq=4))
    assert mesh2.shape["data"] == 2
    with pytest.raises(ValueError, match="devices"):
        make_mesh(MeshConfig(num_data=4, num_seq=4))


def test_flag_driven_decode_matches_local(setup):
    """make_end_to_end_decode with the sp tower == the local program."""
    cfg, mesh, params, fe, raw = setup
    tower = make_sp_audio_tower(mesh, cfg)
    lp_sp, picks_sp = make_end_to_end_decode(cfg, vgg_spec=TINY_SPEC, audio_g_fn=tower)(
        params, fe, raw
    )
    lp_l, picks_l = make_end_to_end_decode(cfg, vgg_spec=TINY_SPEC)(params, fe, raw)
    np.testing.assert_array_equal(np.asarray(picks_sp), np.asarray(picks_l))
    np.testing.assert_allclose(np.asarray(lp_sp), np.asarray(lp_l), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("drop", [0.0, 0.3])
def test_training_grad_parity(setup, rng, drop):
    """Grads through the flag-driven SP chain == local, incl. similarity
    dropout (same rng consumption as ops.bidaf.similarity_matrix)."""
    cfg, mesh, params, fe, raw = setup
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, drop_prob=drop)
    )
    tower = make_sp_audio_tower(mesh, cfg)
    B = raw["sent_mask"].shape[0]
    K = cfg.model.max_decode_steps
    tgts = jnp.asarray(
        rng.integers(0, cfg.data.max_sentences, (B, K)).astype(np.int32)
    )
    tmask = jnp.ones((B, K), jnp.float32)
    key = jax.random.key(7)

    def loss(p, sp):
        b = apply_frontend(fe, raw, cfg, TINY_SPEC, sp_audio=sp)
        b = dict(b, targets=tgts, target_mask=tmask)
        lp = mmbidaf_apply(p, b, cfg, rng=key, audio_g_fn=tower if sp else None)
        return nll_loss(lp, tgts, tmask)

    v_sp, g_sp = jax.jit(jax.value_and_grad(lambda p: loss(p, True)))(params)
    v_l, g_l = jax.jit(jax.value_and_grad(lambda p: loss(p, False)))(params)
    np.testing.assert_allclose(float(v_sp), float(v_l), rtol=1e-4)
    ref = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_leaves_with_path(g_l)
    }
    for k, v in jax.tree_util.tree_leaves_with_path(g_sp):
        ks = jax.tree_util.keystr(k)
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(ref[ks]), rtol=5e-3, atol=2e-5, err_msg=ks
        )


def test_bf16_decode_parity(setup, rng):
    """bf16 model + SP tower: the f32-internal ring/frontend stages match
    the local bf16 path within bf16 tolerance (the dtype decision of
    parallel/sp_tower.py)."""
    cfg, mesh, params, fe, raw = setup
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, compute_dtype="bfloat16")
    )
    tower = make_sp_audio_tower(mesh, cfg)
    lp_sp, _ = make_end_to_end_decode(cfg, vgg_spec=TINY_SPEC, audio_g_fn=tower)(
        params, fe, raw
    )
    lp_l, _ = make_end_to_end_decode(cfg, vgg_spec=TINY_SPEC)(params, fe, raw)
    # bf16 has ~3 decimal digits; the SP path does some stages in f32 so the
    # two paths round differently — compare at bf16 resolution.
    np.testing.assert_allclose(np.asarray(lp_sp), np.asarray(lp_l), rtol=0.05, atol=0.05)


def test_train_step_rejects_feature_batches(setup):
    """MeshConfig.sp_audio + a precomputed-feature batch is a config error
    with an actionable message, not a silent KeyError."""
    from mmbidaf_tpu.train.loop import make_train_step

    cfg, mesh, params, fe, raw = setup
    with pytest.raises(ValueError, match="fe_params"):
        make_train_step(cfg, audio_g_fn=make_sp_audio_tower(mesh, cfg))


def test_frame_bucket_divisibility_error(setup):
    cfg, mesh, *_ = setup
    bad = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, max_audio_frames=10)
    )
    with pytest.raises(ValueError, match="max_audio_frames"):
        make_sp_audio_tower(mesh, bad)


def test_summarizer_consumes_sp_flag(setup, tmp_path, rng):
    """Summarizer reads cfg.mesh.sp_audio and produces the same summaries
    as the local-tower Summarizer (the serving surface of the flag)."""
    import wave as wave_mod

    from PIL import Image

    from mmbidaf_tpu.serving import Summarizer

    cfg, mesh, params, fe, raw = setup
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, img_feat_dim=32)
    )
    cfg_local = dataclasses.replace(cfg, mesh=MeshConfig())

    # one tiny synthetic video on disk
    d = cfg.data
    vd = tmp_path / "vid0"
    (vd / "frames").mkdir(parents=True)
    for i in range(3):
        arr = (rng.random((12, 16, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(vd / "frames" / f"f{i}.png")
    n_samples = d.max_audio_frames * d.hop_length + d.win_length
    sig = (rng.standard_normal(n_samples // 2) * 8000).astype(np.int16)
    with wave_mod.open(str(vd / "audio.wav"), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(d.sample_rate)
        w.writeframes(sig.tobytes())
    (vd / "transcript.txt").write_text(
        " ".join(f"Sentence {j} covers topic {j}." for j in range(5))
    )

    s_sp = Summarizer.init_random(cfg, seed=3, vgg_spec=TINY_SPEC)
    s_l = Summarizer.init_random(cfg_local, seed=3, vgg_spec=TINY_SPEC)
    assert s_sp._audio_g_fn is not None and s_l._audio_g_fn is None
    assert s_sp.summarize(str(vd)) == s_l.summarize(str(vd))

    # long-transcript windowed serving composes with the SP tower: each
    # window re-featurizes the raw waveform sharded (no gathered cache)
    long_sents = " ".join(
        f"Windowed sentence {j} talks about item {j}." for j in range(20)
    )
    (vd / "transcript.txt").write_text(long_sents)
    assert s_sp.summarize_long(str(vd)) == s_l.summarize_long(str(vd))
