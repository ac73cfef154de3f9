"""Bucket-ladder serving (``Summarizer(serve_buckets=…)``): device batches
trim their feature axes to the smallest ladder rung covering the batch's
TRUE lengths, so short videos skip the padded VGG/MFCC compute — without
changing outputs (masks carry true lengths; SURVEY §8 risk R3's trimming
argument, proven on the training path by the bucketed_iterator tests,
applied to the serving surface).
"""

import dataclasses
import wave as wave_mod

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmbidaf_tpu.config import MeshConfig, tiny_test_config
from mmbidaf_tpu.data.frontend import frontend_init, make_end_to_end_decode
from mmbidaf_tpu.data.synthetic import random_word_vectors
from mmbidaf_tpu.models.mmbidaf import mmbidaf_init
from mmbidaf_tpu.ops.vgg import TINY_SPEC
from mmbidaf_tpu.serving import (
    DynamicBatcher,
    Summarizer,
    serving_bucket_ladders,
    trim_raw_batch,
)


# -- ladder resolution --------------------------------------------------------


def test_default_ladders_cover_all_axes():
    cfg = tiny_test_config()  # caps: T_s 7, W 9, T_img 6, T_aud 11
    lad = serving_bucket_ladders(cfg, True)
    assert set(lad) == {"sentences", "words", "keyframes", "audio_frames"}
    for key, cap in (("sentences", 7), ("words", 9),
                     ("keyframes", 6), ("audio_frames", 11)):
        assert lad[key][-1] == cap, f"{key} ladder must end at the cap"
        assert lad[key] == tuple(sorted(set(lad[key])))


def test_explicit_ladders_get_cap_appended():
    cfg = tiny_test_config()
    lad = serving_bucket_ladders(cfg, {"keyframes": (2,), "audio_frames": (4, 8)})
    # a request longer than the top explicit rung must pad up, never be cut
    assert lad["keyframes"] == (2, 6)
    assert lad["audio_frames"] == (4, 8, 11)
    # unspecified axes fall back to the defaults
    assert lad["sentences"][-1] == 7


def test_ladder_validation_errors():
    cfg = tiny_test_config()
    with pytest.raises(ValueError, match="unknown serve_buckets axes"):
        serving_bucket_ladders(cfg, {"frames": (2,)})
    with pytest.raises(ValueError, match="rungs < 1"):
        serving_bucket_ladders(cfg, {"keyframes": (0, 2)})


def test_non_dict_and_empty_serve_buckets_rejected():
    """A tuple/list probably meant a ladder and an empty dict probably
    meant a filtered suggest_buckets result — both fail loudly instead of
    silently serving default ladders / silently disabling."""
    cfg = tiny_test_config()
    for bad in ((4, 8), [4, 8], {}, "auto"):
        with pytest.raises(ValueError, match="serve_buckets must be"):
            serving_bucket_ladders(cfg, bad)
    s = Summarizer.init_random(cfg, seed=1, vgg_spec=TINY_SPEC,
                               serve_buckets=False)
    assert s._ladders is None and not s.bucket_levels  # False = off


def test_covering_level_missing_axis_never_covers():
    from mmbidaf_tpu.serving import covering_level

    levels = [{"sentences": 4, "words": 4}]  # hand-edited manifest shape
    needs = {"sentences": 2, "keyframes": 3}
    assert covering_level(levels, needs) == -1  # falls to full-cap, no raise
    assert covering_level(levels, {"sentences": 2, "words": 4}) == 0


def test_sp_audio_ladders_align_to_num_seq():
    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, max_audio_frames=16),
        mesh=MeshConfig(num_data=2, num_seq=4, sp_audio=True),
    )
    lad = serving_bucket_ladders(cfg, {"audio_frames": (3, 6)})
    assert lad["audio_frames"] == (4, 8, 16)  # rounded up to num_seq multiples
    # an unaligned cap cannot bucket the audio axis under sp_audio
    bad = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, max_audio_frames=14)
    )
    with pytest.raises(ValueError, match="multiple of"):
        serving_bucket_ladders(bad, True)


# -- trim semantics at the decode level --------------------------------------


def test_trimmed_decode_matches_full(eight_device_mesh):
    """A ragged raw batch decoded at trimmed rung shapes == decoded at the
    config caps: picks identical, log-probs equal on the surviving slots —
    garbage in the padding proves the masks (not the pad values) carry the
    semantics.

    Seed choice: untrained random params can score two sentences within
    ~1e-5 — a dead tie that fp reassociation across shapes flips, cascading
    through mask_selected. Seed 7 keeps every top-2 gap > 1e-3 (guarded
    below), so this tests semantics, not argmax tie-breaking."""
    del eight_device_mesh
    rng = np.random.default_rng(7)
    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, img_feat_dim=32, audio_feat_dim=cfg.data.n_mfcc
        ),
    )
    d = cfg.data
    B = 3
    n_samples = d.max_audio_frames * d.hop_length + d.win_length
    raw = {
        "text_ids": rng.integers(
            2, d.vocab_size, (B, d.max_sentences, d.max_words)
        ).astype(np.int32),
        "word_mask": np.zeros((B, d.max_sentences, d.max_words), np.float32),
        "sent_mask": np.zeros((B, d.max_sentences), np.float32),
        "frames": (rng.random((B, d.max_keyframes, 24, 32, 3)) * 255).astype(
            np.uint8
        ),
        "img_mask": np.zeros((B, d.max_keyframes), np.float32),
        "waveform": (rng.standard_normal((B, n_samples)) * 0.1).astype(np.float32),
        "aud_mask": np.zeros((B, d.max_audio_frames), np.float32),
    }
    # true lengths well below the caps → every axis lands on a smaller rung
    raw["sent_mask"][:, :3] = 1.0
    for j, n in enumerate((4, 2, 1)):
        raw["word_mask"][:, j, :n] = 1.0
    raw["img_mask"][:, :2] = 1.0
    raw["aud_mask"][:, :4] = 1.0

    wv = random_word_vectors(rng, d.vocab_size, cfg.model.emb_dim)
    params = mmbidaf_init(jax.random.key(7), cfg, jnp.asarray(wv))
    fe = frontend_init(jax.random.key(8), cfg, vgg_spec=TINY_SPEC)
    decode = make_end_to_end_decode(cfg, vgg_spec=TINY_SPEC)

    lp_full, picks_full = decode(
        params, fe, {k: jnp.asarray(v) for k, v in raw.items()}
    )
    lpf = np.asarray(lp_full)[:, :, :3]
    for b in range(B):
        for k in range(lpf.shape[1]):
            row = np.sort(lpf[b, k][lpf[b, k] > -1e29])
            if len(row) >= 2:
                assert row[-1] - row[-2] > 1e-3, (
                    "near-tie in the fixture decode — pick a different seed"
                )
    ladders = serving_bucket_ladders(cfg, True)
    trimmed = trim_raw_batch(raw, cfg, ladders)
    bs = trimmed["sent_mask"].shape[1]
    assert bs < d.max_sentences
    assert trimmed["word_mask"].shape[2] < d.max_words
    assert trimmed["img_mask"].shape[1] < d.max_keyframes
    assert trimmed["aud_mask"].shape[1] < d.max_audio_frames
    assert (
        trimmed["waveform"].shape[1]
        == trimmed["aud_mask"].shape[1] * d.hop_length + d.win_length
    )
    lp_t, picks_t = decode(
        params, fe, {k: jnp.asarray(v) for k, v in trimmed.items()}
    )
    np.testing.assert_array_equal(np.asarray(picks_t), np.asarray(picks_full))
    lp_t = np.asarray(lp_t)[:, :, :3]
    lp_full = np.asarray(lp_full)[:, :, :3]
    # mask_selected writes -1e30 at already-picked slots; with identical
    # picks the finite/masked pattern must match, and the finite entries
    # must agree to fp-reassociation noise
    finite = lp_full > -1e29
    np.testing.assert_array_equal(lp_t > -1e29, finite)
    # the VGG stack reassociates differently at different frame counts —
    # measured ~8e-4 relative drift on this fixture, well under the 1.8e-3
    # top-2 gap the seed guard enforces
    np.testing.assert_allclose(lp_t[finite], lp_full[finite], rtol=2e-3, atol=2e-4)


# -- Summarizer / DynamicBatcher surface --------------------------------------


def _write_video(vd, rng, cfg, sentences, n_frames, audio_frac):
    from PIL import Image

    d = cfg.data
    (vd / "frames").mkdir(parents=True)
    for i in range(n_frames):
        arr = (rng.random((12, 16, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(vd / "frames" / f"f{i}.png")
    n_samples = d.max_audio_frames * d.hop_length + d.win_length
    n = max(int(n_samples * audio_frac), 1)
    sig = (rng.standard_normal(n) * 8000).astype(np.int16)
    with wave_mod.open(str(vd / "audio.wav"), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(d.sample_rate)
        w.writeframes(sig.tobytes())
    (vd / "transcript.txt").write_text(" ".join(sentences))
    return str(vd)


@pytest.fixture(scope="module")
def bucket_setup(tmp_path_factory, eight_device_mesh):
    """Ragged short videos + one long-transcript video, plus a bucketed and
    an unbucketed Summarizer SHARING the same params."""
    del eight_device_mesh
    rng = np.random.default_rng(17)
    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, img_feat_dim=32, audio_feat_dim=cfg.data.n_mfcc
        ),
    )
    root = tmp_path_factory.mktemp("bucket_vids")
    # sentences use the init_random vocab ("w<i>") so embeddings are real
    # and distinct (all-OOV sentences embed identically → argmax ties that
    # can flip between program shapes), and stay ≤ 4 tokens so the word
    # axis lands on the 4-rung instead of the 9 cap
    # The leading capital makes the regex sentence splitter split (it wants
    # an uppercase sentence start); word_tokenize lowercases, so "W3" still
    # hits the vocab's "w3".
    short = [
        _write_video(
            root / f"vid{v}", rng, cfg,
            [f"W{(7 * v + 2 * j) % 30} w{(7 * v + 2 * j + 1) % 30}."
             for j in range(3)],
            n_frames=2, audio_frac=0.3,
        )
        for v in range(3)
    ]
    long_vid = _write_video(
        root / "long", rng, cfg,
        [f"W{2 * j} w{2 * j + 1} w{(3 * j) % 40}." for j in range(12)],
        n_frames=2, audio_frac=0.3,
    )
    plain = Summarizer.init_random(cfg, seed=5, vgg_spec=TINY_SPEC)
    bucketed = Summarizer(
        plain.params, plain.fe_params, plain.word2idx, cfg, TINY_SPEC,
        serve_buckets=True,
    )
    return plain, bucketed, short, long_vid


def test_summarize_batch_parity_and_stats(bucket_setup):
    plain, bucketed, short, _ = bucket_setup
    assert bucketed.summarize_batch(short) == plain.summarize_batch(short)
    d = plain.cfg.data
    caps = (d.max_sentences, d.max_words, d.max_keyframes, d.max_audio_frames)
    assert bucketed.bucket_stats, "bucketed path must record rung tuples"
    for rung in bucketed.bucket_stats:
        assert len(rung) == 4
        # the fixture's videos are ragged on every axis → a strict trim
        assert all(r < c for r, c in zip(rung, caps)), (rung, caps)


def test_beam_mode_parity(bucket_setup):
    plain, _, short, _ = bucket_setup
    cfg = plain.cfg
    beam_plain = Summarizer(
        plain.params, plain.fe_params, plain.word2idx, cfg, TINY_SPEC,
        mode="beam", topk=3,
    )
    beam_bucketed = Summarizer(
        plain.params, plain.fe_params, plain.word2idx, cfg, TINY_SPEC,
        mode="beam", topk=3, serve_buckets=True,
    )
    assert beam_bucketed.summarize(short[0]) == beam_plain.summarize(short[0])


def test_dynamic_batcher_applies_buckets(bucket_setup):
    plain, bucketed, short, _ = bucket_setup
    want = plain.summarize_batch(short)
    n0 = sum(bucketed.bucket_stats.values())
    with DynamicBatcher(bucketed, max_batch_size=len(short),
                        max_wait_ms=200.0) as b:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=len(short)) as ex:
            got = list(ex.map(b.submit, short))
    assert got == want
    assert sum(bucketed.bucket_stats.values()) > n0


def test_dynamic_batcher_groups_mixed_lengths(bucket_setup):
    """A mixed coalesced set splits by covering rung level: the long video
    must not drag the short ones to full-cap shapes. Results match the
    sequential plain path exactly; stats record the split."""
    from concurrent.futures import Future

    plain, bucketed, short, long_vid = bucket_setup
    vids = short + [long_vid]
    want = plain.summarize_batch(vids)
    b = DynamicBatcher(bucketed, max_batch_size=4, max_wait_ms=1.0)
    try:
        items = []
        for vd in vids:
            row, sents = bucketed._raw_row(vd)
            items.append((row, sents, Future()))
        # drive the batcher's own grouping path deterministically (thread
        # timing must not decide whether the requests coalesced)
        b._run_batch(items)
        got = [it[2].result(timeout=60) for it in items]
    finally:
        b.close()
    assert got == want
    assert b.stats["bucket_splits"] == 1
    assert b.stats["batches"] == 2  # one rung-level group + one full-cap
    # the short group decoded at rung shapes, the long one at the caps
    d = plain.cfg.data
    rungs = set(bucketed.bucket_stats)
    assert any(r[0] < d.max_sentences for r in rungs)
    assert any(r[0] == d.max_sentences for r in rungs)


def test_dynamic_batcher_group_buckets_off(bucket_setup):
    """group_buckets=False keeps one full-cap device call for a mixed set
    (the saturated-throughput mode the constructor docs describe)."""
    from concurrent.futures import Future

    plain, bucketed, short, long_vid = bucket_setup
    vids = short + [long_vid]
    want = plain.summarize_batch(vids)
    b = DynamicBatcher(bucketed, max_batch_size=4, max_wait_ms=1.0,
                       group_buckets=False)
    try:
        items = []
        for vd in vids:
            row, sents = bucketed._raw_row(vd)
            items.append((row, sents, Future()))
        b._run_batch(items)
        got = [it[2].result(timeout=60) for it in items]
    finally:
        b.close()
    assert got == want
    assert b.stats["bucket_splits"] == 0 and b.stats["batches"] == 1


def test_summarize_long_parity(bucket_setup):
    plain, bucketed, _, long_vid = bucket_setup
    assert bucketed.summarize_long(long_vid) == plain.summarize_long(long_vid)


def test_empty_transcript_bucketed(bucket_setup, tmp_path):
    plain, bucketed, _, _ = bucket_setup
    rng = np.random.default_rng(23)
    vd = _write_video(tmp_path / "empty", rng, plain.cfg, [],
                      n_frames=1, audio_frac=0.2)
    assert bucketed.summarize(vd) == plain.summarize(vd)


def test_warmup_covers_diagonal_levels(bucket_setup):
    """warmup on a bucketed Summarizer compiles the diagonal rung levels
    (smoke: runs through the real decode path) and changes no outputs."""
    plain, _, short, _ = bucket_setup
    s = Summarizer(
        plain.params, plain.fe_params, plain.word2idx, plain.cfg, TINY_SPEC,
        serve_buckets=True,
    )
    before = plain.summarize(short[0])
    s.warmup(frame_hw=(12, 16))
    assert s.summarize(short[0]) == before


# -- composition with the parallel serving paths -------------------------------


def test_dp_serving_with_buckets(bucket_setup):
    """serve_buckets × data_parallel: feature-axis trims are orthogonal to
    the batch-axis sharding — summaries match the plain path."""
    plain, _, short, _ = bucket_setup
    cfg_dp = dataclasses.replace(plain.cfg, mesh=MeshConfig(num_data=8))
    s_dp = Summarizer(
        plain.params, plain.fe_params, plain.word2idx, cfg_dp, TINY_SPEC,
        serve_batch_size=8, data_parallel=True, serve_buckets=True,
    )
    assert s_dp.summarize_batch(short) == plain.summarize_batch(short)
    assert s_dp.bucket_stats


def test_sp_serving_with_buckets(tmp_path_factory, eight_device_mesh):
    """serve_buckets × sp_audio: audio rungs align to num_seq, so the SP
    frontend's frames%num_seq check holds on every trimmed batch — flag-on
    summaries match flag-off on the same SP summarizer."""
    del eight_device_mesh
    from tests.test_sp_product import _sp_config

    rng = np.random.default_rng(31)
    cfg = _sp_config()  # 2×4 ('data','seq') mesh, max_audio_frames=16
    vd = tmp_path_factory.mktemp("sp_bucket_vid") / "vid"
    video = _write_video(
        vd, rng, cfg,
        [f"W{2 * j} w{2 * j + 1}." for j in range(3)],
        n_frames=2, audio_frac=0.3,
    )
    sp_plain = Summarizer.init_random(cfg, seed=9, vgg_spec=TINY_SPEC)
    sp_bucketed = Summarizer(
        sp_plain.params, sp_plain.fe_params, sp_plain.word2idx, cfg,
        TINY_SPEC, serve_buckets=True,
    )
    assert sp_bucketed.summarize(video) == sp_plain.summarize(video)
    (rung,) = sp_bucketed.bucket_stats
    assert rung[3] % cfg.mesh.num_seq == 0
    assert rung[3] < cfg.data.max_audio_frames


# -- bucketed AOT artifacts ----------------------------------------------------


@pytest.fixture(scope="module")
def bucket_artifact(bucket_setup, tmp_path_factory):
    from mmbidaf_tpu.export import ExportedSummarizer, export_summarizer

    plain, _, _, _ = bucket_setup
    out = str(tmp_path_factory.mktemp("bucket_artifact"))
    export_summarizer(plain, out, batch_size=3, frame_hw=(12, 16), buckets=True)
    return ExportedSummarizer(out), out


def test_bucketed_artifact_parity_and_levels(bucket_setup, bucket_artifact):
    """A bucketed artifact reproduces live summaries, ships extra rung
    programs, and trims short batches onto one of them."""
    plain, _, short, _ = bucket_setup
    es, out = bucket_artifact
    assert es.decoder.bucket_levels, "manifest must list bucket programs"
    import json
    import os

    with open(os.path.join(out, "manifest.json")) as f:
        manifest = json.load(f)
    for entry in manifest["bucket_programs"]:
        assert os.path.exists(os.path.join(out, entry["file"]))
    assert es.summarize_batch(short) == plain.summarize_batch(short)
    # the stacked short batch lands on a rung level, not the caps — and the
    # artifact records rung stats like the live Summarizer (→ /healthz)
    rows = [es._raw_row(vd)[0] for vd in short]
    stacked = es._stack_rows(rows)
    d = plain.cfg.data
    assert stacked["img_mask"].shape[1] < d.max_keyframes
    assert stacked["aud_mask"].shape[1] < d.max_audio_frames
    assert es.bucket_stats and all(len(k) == 4 for k in es.bucket_stats)


def test_bucketed_artifact_dynamic_batcher(bucket_setup, bucket_artifact):
    plain, _, short, _ = bucket_setup
    es, _ = bucket_artifact
    want = plain.summarize_batch(short)
    with DynamicBatcher(es, max_batch_size=3, max_wait_ms=200.0) as b:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=3) as ex:
            got = list(ex.map(b.submit, short))
    assert got == want


def test_bucketed_artifact_warmup_and_shape_error(bucket_artifact):
    es, _ = bucket_artifact
    es.warmup()  # compiles full-cap + every rung program
    d = es.cfg.data
    bad = {
        s["name"]: np.zeros([dim + 1 for dim in s["shape"]], s["dtype"])
        for s in es.decoder.manifest["raw_inputs"]
    }
    del d
    with pytest.raises(ValueError, match="match none of the artifact's"):
        es.decoder.decode_raw(bad)


def test_explicit_ladder_dict_accepted(bucket_setup):
    plain, _, short, _ = bucket_setup
    s = Summarizer(
        plain.params, plain.fe_params, plain.word2idx, plain.cfg, TINY_SPEC,
        serve_buckets={"keyframes": (2,), "audio_frames": (6,)},
    )
    assert s.summarize(short[0]) == plain.summarize(short[0])
    (rung,) = s.bucket_stats
    assert rung[2] == 2 and rung[3] == 6
