"""Data-parallel serving (Summarizer(data_parallel=True)): the request batch
shards over the mesh's data axes and outputs match single-device serving
exactly; misconfigurations that would silently serialize raise instead.

Runs on the conftest's 8-device CPU mesh (SURVEY §4 test plan row 3).
"""

import dataclasses
import wave as wave_mod

import numpy as np
import pytest

from mmbidaf_tpu.config import MeshConfig, tiny_test_config
from mmbidaf_tpu.ops.vgg import TINY_SPEC
from mmbidaf_tpu.serving import DynamicBatcher, Summarizer


def _cfg(**mesh_kw):
    cfg = tiny_test_config()
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, img_feat_dim=32, audio_feat_dim=cfg.data.n_mfcc
        ),
        mesh=MeshConfig(**mesh_kw),
    )


@pytest.fixture(scope="module")
def videos(tmp_path_factory):
    """Three distinct tiny videos under the tiny config's shapes."""
    from PIL import Image

    rng = np.random.default_rng(11)
    d = tiny_test_config().data
    n_samples = d.max_audio_frames * d.hop_length + d.win_length
    root = tmp_path_factory.mktemp("dp_vids")
    dirs = []
    for v in range(3):
        vd = root / f"vid{v}"
        (vd / "frames").mkdir(parents=True)
        for i in range(3):
            arr = (rng.random((12, 16, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(vd / "frames" / f"f{i}.png")
        sig = (rng.standard_normal(n_samples // 2) * 8000).astype(np.int16)
        with wave_mod.open(str(vd / "audio.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(d.sample_rate)
            w.writeframes(sig.tobytes())
        (vd / "transcript.txt").write_text(
            " ".join(f"Clip {v} sentence {j} covers item {v}{j}." for j in range(5))
        )
        dirs.append(str(vd))
    return dirs


def test_dp_matches_single_device(videos):
    s_one = Summarizer.init_random(_cfg(), seed=5, vgg_spec=TINY_SPEC,
                                   serve_batch_size=8)
    s_dp = Summarizer.init_random(_cfg(num_data=8), seed=5, vgg_spec=TINY_SPEC,
                                  serve_batch_size=8, data_parallel=True)
    assert s_dp._dp_shards == 8
    # params actually live replicated on the mesh
    leaf = next(iter(jax_leaves(s_dp.params)))
    assert len(leaf.sharding.device_set) == 8

    reqs = [videos[i % 3] for i in range(5)]  # non-divisible request count →
    # pad/chunk via serve_batch_size, still one static sharded shape
    assert s_dp.summarize_batch(reqs) == s_one.summarize_batch(reqs)
    assert s_dp.summarize(videos[0]) == s_one.summarize(videos[0])


def jax_leaves(tree):
    import jax

    return jax.tree.leaves(tree)


def test_dp_beam_and_long(videos):
    s_one = Summarizer.init_random(_cfg(), seed=6, vgg_spec=TINY_SPEC,
                                   mode="beam", serve_batch_size=4)
    s_dp = Summarizer.init_random(_cfg(num_data=4), seed=6, vgg_spec=TINY_SPEC,
                                  mode="beam", serve_batch_size=4,
                                  data_parallel=True)
    assert s_dp.summarize_batch(videos) == s_one.summarize_batch(videos)

    # windowed long-transcript decode pads window batches to serve_batch_size
    import pathlib

    vd = pathlib.Path(videos[1])
    old = (vd / "transcript.txt").read_text()
    try:
        (vd / "transcript.txt").write_text(
            " ".join(f"Long sentence {j} covers item {j}." for j in range(20))
        )
        assert s_dp.summarize_long(str(vd)) == s_one.summarize_long(str(vd))
    finally:
        (vd / "transcript.txt").write_text(old)


def test_dp_topk_matches_single_device(videos):
    """Sampling consumes one rng per device batch; the draw is a pure
    function of the key, so sharding must not change the sampled picks."""
    s_one = Summarizer.init_random(_cfg(), seed=8, vgg_spec=TINY_SPEC,
                                   mode="topk", topk=3, serve_batch_size=4)
    s_dp = Summarizer.init_random(_cfg(num_data=4), seed=8, vgg_spec=TINY_SPEC,
                                  mode="topk", topk=3, serve_batch_size=4,
                                  data_parallel=True)
    assert s_dp.summarize_batch(videos) == s_one.summarize_batch(videos)


def test_dp_composes_with_sp_audio(videos):
    """DP × SP on one mesh: batch sharded over 'data', audio frames over
    'seq' (use_batch_axis=True inside the SP stages)."""
    def pad_aud(cfg):  # seq axis needs a divisible frame bucket
        return dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, max_audio_frames=16)
        )

    s_local = Summarizer.init_random(pad_aud(_cfg()), seed=7,
                                     vgg_spec=TINY_SPEC, serve_batch_size=4)
    s_dpsp = Summarizer.init_random(
        pad_aud(_cfg(num_data=4, num_seq=2, sp_audio=True)), seed=7,
        vgg_spec=TINY_SPEC, serve_batch_size=4, data_parallel=True,
    )
    assert s_dpsp._audio_g_fn is not None
    assert s_dpsp.summarize_batch(videos) == s_local.summarize_batch(videos)


def test_dp_dynamic_batcher(videos):
    s_dp = Summarizer.init_random(_cfg(num_data=4), seed=5, vgg_spec=TINY_SPEC,
                                  serve_batch_size=4, data_parallel=True)
    expected = {vd: s_dp.summarize(vd) for vd in videos}
    with DynamicBatcher(s_dp, max_batch_size=4, max_wait_ms=50.0) as b:
        assert [b.submit(vd) for vd in videos] == [expected[vd] for vd in videos]
    with pytest.raises(ValueError, match="multiple of"):
        DynamicBatcher(s_dp, max_batch_size=3)


def test_dp_composes_with_tp_vgg(videos):
    """DP × TP on one (data, model) mesh: the batch shards over 'data'
    while the VGG classifier weights shard over 'model' (fc1 column- /
    fc2 row-parallel, SURVEY §3.3 TP row) — outputs match plain serving."""
    s_one = Summarizer.init_random(_cfg(), seed=9, vgg_spec=TINY_SPEC,
                                   serve_batch_size=4)
    s_tp = Summarizer.init_random(
        _cfg(num_data=4, num_model=2, tp_vgg=True), seed=9,
        vgg_spec=TINY_SPEC, serve_batch_size=4, data_parallel=True,
    )
    assert s_tp._dp_shards == 4  # batch shards over 'data' only, not 'model'
    from jax.sharding import PartitionSpec as P

    assert s_tp.fe_params["vgg"]["fc1_w"].sharding.spec == P(None, "model")
    assert s_tp.summarize_batch(videos) == s_one.summarize_batch(videos)


def test_tp_vgg_without_dp(videos):
    """TP-only serving (latency mode): the request batch replicates over
    the mesh, only the classifier weights shard."""
    s_one = Summarizer.init_random(_cfg(), seed=9, vgg_spec=TINY_SPEC)
    s_tp = Summarizer.init_random(
        _cfg(num_data=1, num_model=2, tp_vgg=True), seed=9, vgg_spec=TINY_SPEC
    )
    assert s_tp._dp_shards == 1
    assert s_tp.summarize(videos[0]) == s_one.summarize(videos[0])


def test_dp_sp_tp_three_axis_mesh(videos):
    """All three parallelism flags on ONE (data, seq, model) mesh: batch
    over 'data', audio frames over 'seq' (SP chain), VGG classifier over
    'model' (TP) — outputs still match plain single-device serving."""
    def pad_aud(cfg):  # seq axis needs a divisible frame bucket
        return dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, max_audio_frames=16)
        )

    s_local = Summarizer.init_random(pad_aud(_cfg()), seed=12,
                                     vgg_spec=TINY_SPEC, serve_batch_size=2)
    s_all = Summarizer.init_random(
        pad_aud(_cfg(num_data=2, num_seq=2, sp_audio=True,
                     num_model=2, tp_vgg=True)),
        seed=12, vgg_spec=TINY_SPEC, serve_batch_size=2, data_parallel=True,
    )
    assert s_all._mesh.axis_names == ("data", "seq", "model")
    assert s_all._audio_g_fn is not None and s_all._dp_shards == 2
    from jax.sharding import PartitionSpec as P

    assert s_all.fe_params["vgg"]["fc2_w"].sharding.spec == P("model", None)
    assert s_all.summarize_batch(videos) == s_local.summarize_batch(videos)


def test_dp_requires_divisible_static_batch():
    with pytest.raises(ValueError, match="multiple of 8"):
        Summarizer.init_random(_cfg(num_data=8), vgg_spec=TINY_SPEC,
                               data_parallel=True)  # no serve_batch_size
    with pytest.raises(ValueError, match="multiple of 8"):
        Summarizer.init_random(_cfg(num_data=8), vgg_spec=TINY_SPEC,
                               serve_batch_size=6, data_parallel=True)
