"""Data-layer tests: vocab build + GloVe parse, transcript encode, gold-label
derivation, WAV decode, keyframe sampling, and a full on-disk corpus →
batched loader → end-to-end decode round trip (SURVEY.md §5 item 4).
"""

import os
import wave as wave_mod

import numpy as np
import pytest

from mmbidaf_tpu.config import tiny_test_config
from mmbidaf_tpu.data import labels, text, video, vocab
from mmbidaf_tpu.data.pipeline import VideoCorpus, batched_iterator, collate


def test_build_vocab_and_encode():
    corpus = [["the", "cat", "sat"], ["the", "dog", "sat", "down"]]
    w2i = vocab.build_vocab(corpus)
    assert w2i[vocab.PAD_TOKEN] == 0 and w2i[vocab.OOV_TOKEN] == 1
    assert w2i["the"] == 2  # most frequent first
    ids = vocab.encode_tokens(["the", "unknown", "cat"], w2i)
    assert ids[0] == 2 and ids[1] == vocab.OOV_ID


def test_load_glove_roundtrip(tmp_path):
    w2i = vocab.build_vocab([["hello", "world"]])
    glove = tmp_path / "glove.txt"
    glove.write_text("hello 1.0 2.0 3.0\nworld 4.0 5.0 6.0\nunused 7.0 8.0 9.0\n")
    table = vocab.load_glove(str(glove), w2i, emb_dim=3)
    np.testing.assert_array_equal(table[w2i["hello"]], [1.0, 2.0, 3.0])
    np.testing.assert_array_equal(table[vocab.PAD_ID], 0.0)
    np.testing.assert_array_equal(table[vocab.OOV_ID], 0.0)
    vocab.save_vocab(w2i, table, str(tmp_path / "v.json"), str(tmp_path / "e.npz"))
    w2i2, table2 = vocab.load_vocab(str(tmp_path / "v.json"), str(tmp_path / "e.npz"))
    assert w2i2 == w2i
    np.testing.assert_array_equal(table2, table)


def test_sentence_split_and_encode():
    transcript = "The model works well. It uses attention! Does it scale? Yes."
    sents = text.sent_tokenize(transcript)
    assert len(sents) == 4
    w2i = vocab.build_vocab([text.word_tokenize(s) for s in sents])
    enc = text.encode_transcript(transcript, w2i, max_sentences=6, max_words=8)
    assert enc["text_ids"].shape == (6, 8)
    assert enc["sent_mask"].sum() == 4
    assert enc["word_mask"][0].sum() == len(text.word_tokenize(sents[0]))
    # padded sentences are fully zero
    assert enc["text_ids"][4:].sum() == 0


def test_greedy_extractive_labels_picks_overlapping():
    sentences = [
        "completely unrelated words here".split(),
        "the quick brown fox jumps".split(),
        "machine learning on tpus is fast".split(),
        "another irrelevant filler sentence".split(),
    ]
    summary = "tpus make machine learning fast the quick fox".split()
    idxs, mask = labels.make_targets(sentences, summary, k=2)
    assert set(idxs.tolist()) == {1, 2}
    assert mask.tolist() == [1.0, 1.0]


def test_wav_decode(tmp_path):
    sr = 8000
    t = np.arange(sr) / sr
    sig = (np.sin(2 * np.pi * 440 * t) * 32000).astype(np.int16)
    path = str(tmp_path / "a.wav")
    with wave_mod.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(sig.tobytes())
    data, sr2 = video.load_wav(path)
    assert sr2 == sr and len(data) == sr
    assert abs(data).max() <= 1.0
    np.testing.assert_allclose(data[:100], sig[:100] / 32768.0, atol=1e-6)


def test_sample_keyframes():
    frames = np.arange(10)[:, None, None, None].repeat(4, 1).repeat(4, 2).repeat(3, 3).astype(np.uint8)
    out, mask = video.sample_keyframes(frames, 4)
    assert out.shape == (4, 4, 4, 3)
    assert mask.tolist() == [1, 1, 1, 1]
    assert out[0, 0, 0, 0] == 0 and out[3, 0, 0, 0] == 9
    out2, mask2 = video.sample_keyframes(frames[:2], 4)
    assert mask2.tolist() == [1, 1, 0, 0]
    assert out2[2:].sum() == 0


@pytest.fixture
def disk_corpus(tmp_path, rng):
    """Three fake videos on disk: PNG frames, WAV audio, transcript + summary."""
    from PIL import Image

    cfg = tiny_test_config()
    d = cfg.data
    n_samples = d.max_audio_frames * d.hop_length + d.win_length
    for v in range(3):
        vd = tmp_path / f"video{v}"
        (vd / "frames").mkdir(parents=True)
        for i in range(5):
            arr = (rng.random((16, 20, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(vd / "frames" / f"f{i:03d}.png")
        sig = (rng.standard_normal(n_samples // 2) * 8000).astype(np.int16)
        with wave_mod.open(str(vd / "audio.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(d.sample_rate)
            w.writeframes(sig.tobytes())
        sents = [f"Sentence {j} of video {v} talks about topic {j}." for j in range(5)]
        (vd / "transcript.txt").write_text(" ".join(sents))
        (vd / "summary.txt").write_text(sents[1] + " " + sents[3])
    return str(tmp_path), cfg


def test_corpus_to_decode_roundtrip(disk_corpus):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from mmbidaf_tpu.data.frontend import frontend_init, make_end_to_end_decode
    from mmbidaf_tpu.models.mmbidaf import mmbidaf_init
    from mmbidaf_tpu.ops.vgg import TINY_SPEC

    root, cfg = disk_corpus
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, img_feat_dim=32, audio_feat_dim=cfg.data.n_mfcc)
    )
    # vocab from the corpus transcripts
    corpus_tokens = []
    for vid in sorted(os.listdir(root)):
        with open(os.path.join(root, vid, "transcript.txt")) as f:
            for s in text.sent_tokenize(f.read()):
                corpus_tokens.append(text.word_tokenize(s))
    w2i = vocab.build_vocab(corpus_tokens)

    corpus = VideoCorpus(root, cfg, w2i)
    assert len(corpus) == 3
    ex = corpus[0]
    assert ex["text_ids"].shape == (cfg.data.max_sentences, cfg.data.max_words)
    assert "targets" in ex and ex["targets"].shape == (cfg.model.max_decode_steps,)

    batch = next(batched_iterator(corpus, batch_size=2, seed=0))
    assert batch["frames"].shape[0] == 2

    # end-to-end through the jitted frontend + model
    wv = np.random.default_rng(0).standard_normal(
        (len(w2i), cfg.model.emb_dim)
    ).astype(np.float32)
    params = mmbidaf_init(jax.random.key(0), cfg, jnp.asarray(wv))
    fe = frontend_init(jax.random.key(1), cfg, vgg_spec=TINY_SPEC)
    raw = {k: jnp.asarray(v) for k, v in batch.items() if k not in ("targets", "target_mask")}
    end_to_end = make_end_to_end_decode(cfg, vgg_spec=TINY_SPEC)
    _, picks = end_to_end(params, fe, raw)
    assert picks.shape == (2, cfg.model.max_decode_steps)
    n_valid = batch["sent_mask"].sum(axis=1)
    assert (np.asarray(picks) < n_valid[:, None]).all()


def test_train_on_raw_disk_corpus(disk_corpus):
    """Raw on-disk corpus → frontend-inside-train-step → finite loss (config 5
    training path: raw video → features → model, one jitted program)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from mmbidaf_tpu.data.frontend import frontend_init
    from mmbidaf_tpu.data.pipeline import VideoCorpus, batched_iterator
    from mmbidaf_tpu.models.mmbidaf import mmbidaf_init
    from mmbidaf_tpu.ops.vgg import TINY_SPEC
    from mmbidaf_tpu.train.loop import init_train_state, make_train_step

    root, cfg = disk_corpus
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, img_feat_dim=32, audio_feat_dim=cfg.data.n_mfcc
        ),
        train=dataclasses.replace(cfg.train, optimizer="adam", lr=1e-3),
    )
    corpus_tokens = []
    for vid in sorted(os.listdir(root)):
        with open(os.path.join(root, vid, "transcript.txt")) as f:
            for s in text.sent_tokenize(f.read()):
                corpus_tokens.append(text.word_tokenize(s))
    w2i = vocab.build_vocab(corpus_tokens)
    corpus = VideoCorpus(root, cfg, w2i)

    wv = np.random.default_rng(0).standard_normal((len(w2i), cfg.model.emb_dim)).astype(np.float32)
    params = mmbidaf_init(jax.random.key(0), cfg, jnp.asarray(wv))
    fe = frontend_init(jax.random.key(1), cfg, vgg_spec=TINY_SPEC)
    state = init_train_state(jax.random.key(2), params, cfg)
    train_step = make_train_step(cfg, fe_params=fe, vgg_spec=TINY_SPEC)

    it = batched_iterator(corpus, batch_size=2, seed=0, drop_remainder=False)
    losses = []
    for _ in range(3):
        batch = {k: jnp.asarray(v) for k, v in next(it).items()}
        state, metrics = train_step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()


def test_real_text_rouge(disk_corpus):
    """Eval ROUGE is computed from the REAL on-disk transcript sentences
    (SURVEY §4.3): picking exactly the gold sentences scores ROUGE-L = 1.0
    against summary.txt, and example_text returns the on-disk strings."""
    from mmbidaf_tpu.data.pipeline import VideoCorpus
    from mmbidaf_tpu.data.vocab import vocab_from_corpus_dir
    from mmbidaf_tpu.train.metrics import batch_rouge, summary_from_picks

    root, cfg = disk_corpus
    w2i = vocab_from_corpus_dir(root)
    corpus = VideoCorpus(root, cfg, w2i)

    sentences, gold = corpus.example_text(0)
    # the fixture writes "Sentence j of video 0 ..." and gold = sents 1 + 3
    assert sentences[2].startswith("Sentence 2 of video 0")
    assert gold == sentences[1] + " " + sentences[3]

    # gold picks → assembled summary is exactly the gold text → ROUGE 1.0
    picks = np.array([[1, 3, 1]])  # duplicate pick is deduped
    assert summary_from_picks(picks[0], sentences) == gold
    scores, n = batch_rouge(picks, [sentences], [gold])
    assert n == 1
    assert scores["ROUGE-L"] == pytest.approx(1.0)
    assert scores["ROUGE-1"] == pytest.approx(1.0)

    # wrong picks score strictly less
    bad, _ = batch_rouge(np.array([[0, 2, 4]]), [sentences], [gold])
    assert bad["ROUGE-L"] < 1.0

    # examples with no gold are skipped, not scored as zero
    scores2, n2 = batch_rouge(
        np.array([[1, 3, 1], [0, 0, 0]]), [sentences, sentences], [gold, None]
    )
    assert n2 == 1 and scores2["ROUGE-L"] == pytest.approx(1.0)


def test_shot_change_keyframes(rng):
    """Shot-change sampling picks the frames after the largest content
    jumps (SURVEY §3.1 'every-N / shot change')."""
    from mmbidaf_tpu.data.video import sample_keyframes_shot_change

    T, H, W = 20, 16, 16
    frames = np.zeros((T, H, W, 3), np.uint8)
    frames[7:] = 120   # hard cut at t=7
    frames[14:] = 240  # hard cut at t=14
    frames += (rng.random((T, H, W, 3)) * 5).astype(np.uint8)  # mild noise

    out, mask = sample_keyframes_shot_change(frames, max_keyframes=3)
    assert mask.sum() == 3
    means = out[:3].mean(axis=(1, 2, 3))
    # anchored first frame + the two cut frames, in temporal order
    assert means[0] < 20 and 100 < means[1] < 150 and means[2] > 220

    # fewer frames than slots falls back to every-N
    out2, mask2 = sample_keyframes_shot_change(frames[:2], max_keyframes=4)
    assert mask2.tolist() == [1, 1, 0, 0]


def test_bucketed_iterator(tmp_path, rng):
    """Bucketed shapes (SURVEY §8 R3): batches are padded to the smallest
    fitting T_sent bucket, real sentences survive, and measured padding
    waste drops vs the single worst-case shape."""
    import dataclasses

    from PIL import Image

    from mmbidaf_tpu.data.pipeline import VideoCorpus, batched_iterator, bucketed_iterator
    from mmbidaf_tpu.data.vocab import vocab_from_corpus_dir

    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, max_sentences=16)
    )
    d = cfg.data
    n_samples = d.max_audio_frames * d.hop_length + d.win_length
    sent_counts = [2, 3, 7, 8, 13, 16]
    for v, n_s in enumerate(sent_counts):
        vd = tmp_path / f"video{v}"
        (vd / "frames").mkdir(parents=True)
        Image.fromarray((rng.random((16, 20, 3)) * 255).astype(np.uint8)).save(
            vd / "frames" / "f000.png"
        )
        sig = (rng.standard_normal(n_samples // 4) * 8000).astype(np.int16)
        with wave_mod.open(str(vd / "audio.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(d.sample_rate)
            w.writeframes(sig.tobytes())
        sents = [f"Video {v} sentence {j} covers topic {j}." for j in range(n_s)]
        (vd / "transcript.txt").write_text(" ".join(sents))
        (vd / "summary.txt").write_text(sents[0])

    w2i = vocab_from_corpus_dir(str(tmp_path))
    corpus = VideoCorpus(str(tmp_path), cfg, w2i)

    buckets = (4, 8, 16)
    it = bucketed_iterator(corpus, batch_size=2, buckets=buckets, seed=0)
    seen_shapes = set()
    pad_slots = real = 0
    for _ in range(9):  # 3 buckets x up-to-2 batches, cycled
        b = next(it)
        T_s = b["text_ids"].shape[1]
        assert T_s in buckets
        assert b["sent_mask"].shape == (2, T_s)
        assert b["word_mask"].shape[1] == T_s
        # every example's real sentence count fits its bucket
        n_real = b["sent_mask"].sum(axis=1)
        assert (n_real <= T_s).all() and (n_real > 0).all()
        seen_shapes.add(T_s)
        pad_slots += b["sent_mask"].size
        real += b["sent_mask"].sum()
    assert seen_shapes == set(buckets), f"buckets unused: {seen_shapes}"
    bucket_waste = 1 - real / pad_slots

    flat = next(batched_iterator(corpus, batch_size=6, seed=0, shuffle=False))
    flat_waste = 1 - flat["sent_mask"].mean()
    assert bucket_waste < flat_waste, (bucket_waste, flat_waste)


def test_suggest_buckets(tmp_path, rng):
    """--buckets auto: ladders derived from corpus length quantiles — every
    example fits, caps respected, audio aligned for the SP frame axis, and
    the suggested ladders drive bucketed_iterator directly."""
    import dataclasses
    import math

    from PIL import Image

    from mmbidaf_tpu.data.pipeline import (
        VideoCorpus,
        bucketed_iterator,
        suggest_buckets,
    )
    from mmbidaf_tpu.data.vocab import vocab_from_corpus_dir

    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, max_sentences=16,
                                      max_audio_frames=24)
    )
    d = cfg.data
    n_samples = d.max_audio_frames * d.hop_length + d.win_length
    sent_counts = [2, 3, 3, 4, 13, 16]
    for v, n_s in enumerate(sent_counts):
        vd = tmp_path / f"video{v}"
        (vd / "frames").mkdir(parents=True)
        Image.fromarray((rng.random((16, 20, 3)) * 255).astype(np.uint8)).save(
            vd / "frames" / "f000.png"
        )
        sig = (rng.standard_normal(max(n_samples // (v + 1), 64)) * 8000).astype(
            np.int16
        )
        with wave_mod.open(str(vd / "audio.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(d.sample_rate)
            w.writeframes(sig.tobytes())
        sents = [f"Video {v} sentence {j} covers topic {j}." for j in range(n_s)]
        (vd / "transcript.txt").write_text(" ".join(sents))
        (vd / "summary.txt").write_text(sents[0])

    w2i = vocab_from_corpus_dir(str(tmp_path))
    corpus = VideoCorpus(str(tmp_path), cfg, w2i)

    for num_seq in (1, 3):
        sug = suggest_buckets(corpus, num_seq=num_seq)
        assert set(sug) == {"sentences", "words", "keyframes", "audio_frames"}
        caps = {"sentences": d.max_sentences, "words": d.max_words,
                "keyframes": d.max_keyframes, "audio_frames": d.max_audio_frames}
        lens = [corpus.example_lengths(i) for i in range(len(corpus))]
        for key, ladder in sug.items():
            assert ladder == tuple(sorted(set(ladder))), ladder
            assert all(1 <= b <= caps[key] for b in ladder), (key, ladder)
            # every example fits the top bucket
            assert max(ln[key] for ln in lens) <= ladder[-1], (key, ladder)
        al = math.lcm(8, num_seq)
        for b in sug["audio_frames"]:
            assert b % al == 0 or b == caps["audio_frames"], (b, al)
        # clustered sentence counts: the p50 bucket sits at the cluster,
        # far below the max — that's the padding the ladder saves
        assert sug["sentences"][0] <= 4 < sug["sentences"][-1]

    # the suggestion plugs straight into the iterator
    sug = suggest_buckets(corpus)
    it = bucketed_iterator(
        corpus, batch_size=2, buckets=sug["sentences"], seed=0,
        word_buckets=sug["words"], img_buckets=sug["keyframes"],
        aud_buckets=sug["audio_frames"],
    )
    for _ in range(4):
        b = next(it)
        assert b["text_ids"].shape[1] in sug["sentences"]
        n_real = b["sent_mask"].sum(axis=1)
        assert (n_real <= b["text_ids"].shape[1]).all()


def test_bucketed_iterator_all_axes(tmp_path, rng):
    """Round-3: the remaining ragged axes — W, T_img, T_aud — are trimmed
    per batch to the smallest covering bucket (SURVEY §8 ground rules),
    masks reflect TRUE lengths, and trimming is semantics-preserving (the
    trimmed batch's forward == the full-shape batch's forward)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from mmbidaf_tpu.data.frontend import apply_frontend, frontend_init
    from mmbidaf_tpu.data.pipeline import VideoCorpus, bucketed_iterator, collate
    from mmbidaf_tpu.data.synthetic import random_word_vectors
    from mmbidaf_tpu.data.vocab import vocab_from_corpus_dir
    from mmbidaf_tpu.models.mmbidaf import mmbidaf_init, mmbidaf_decode
    from mmbidaf_tpu.ops.vgg import TINY_SPEC

    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, max_sentences=8, max_words=12, max_keyframes=8,
            max_audio_frames=16,
        ),
        model=dataclasses.replace(
            cfg.model, audio_feat_dim=cfg.data.n_mfcc, img_feat_dim=32
        ),
    )
    d = cfg.data
    n_samples = d.max_audio_frames * d.hop_length + d.win_length
    # ragged on every axis: (sentences, words/sentence, frames, audio_frac);
    # every video has ≥ max_decode_steps sentences — with fewer, the
    # decoder's all-picked uniform fallback depends on T_s and trimming
    # would (harmlessly) differ on those dead steps
    specs = [(3, 2, 1, 0.2), (4, 4, 2, 0.3), (6, 9, 5, 0.9), (8, 11, 7, 1.0)]
    for v, (n_s, n_w, n_f, a_frac) in enumerate(specs):
        vd = tmp_path / f"video{v}"
        (vd / "frames").mkdir(parents=True)
        for i in range(n_f):
            Image.fromarray((rng.random((12, 16, 3)) * 255).astype(np.uint8)).save(
                vd / "frames" / f"f{i:03d}.png"
            )
        sig = (rng.standard_normal(int(n_samples * a_frac)) * 8000).astype(np.int16)
        with wave_mod.open(str(vd / "audio.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(d.sample_rate)
            w.writeframes(sig.tobytes())
        # capitalized first word so the sentence splitter sees boundaries
        sents = [
            f"Topic{v}n{j} " + " ".join(f"w{v}x{j}y{k}" for k in range(n_w - 1)) + "."
            for j in range(n_s)
        ]
        (vd / "transcript.txt").write_text(" ".join(sents))
        (vd / "summary.txt").write_text(sents[0])

    w2i = vocab_from_corpus_dir(str(tmp_path))
    corpus = VideoCorpus(str(tmp_path), cfg, w2i)

    # true-length metadata (header-only IO) and the true-length aud_mask
    ln = corpus.example_lengths(0)
    assert ln["sentences"] == 3 and ln["keyframes"] == 1
    assert ln["audio_frames"] < d.max_audio_frames
    ex0 = corpus[0]
    assert ex0["aud_mask"].sum() == ln["audio_frames"]

    it = bucketed_iterator(
        corpus, batch_size=2, buckets=(4, 8), seed=0,
        word_buckets=(4, 12), img_buckets=(2, 8), aud_buckets=(4, 8, 16),
    )
    shapes = set()
    for _ in range(6):
        b = next(it)
        B, T_s, W = b["text_ids"].shape
        T_i = b["img_mask"].shape[1]
        T_a = b["aud_mask"].shape[1]
        assert T_s in (4, 8) and W in (4, 12) and T_i in (2, 8)
        assert T_a in (4, 8, 16)
        assert b["waveform"].shape[1] == T_a * d.hop_length + d.win_length
        # nothing real was cut
        assert (b["sent_mask"].sum(1) > 0).all()
        assert (b["word_mask"].sum(2) <= W).all()
        shapes.add((T_s, W, T_i, T_a))
    assert len(shapes) > 1, "bucketing never varied the shapes"

    # semantics-preserving: trimmed forward == full-shape forward
    wv = random_word_vectors(rng, len(w2i), cfg.model.emb_dim)
    params = mmbidaf_init(jax.random.key(0), cfg, jnp.asarray(wv))
    fe = frontend_init(jax.random.key(1), cfg, vgg_spec=TINY_SPEC)
    it2 = bucketed_iterator(
        corpus, batch_size=2, buckets=(4, 8), seed=3,
        word_buckets=(4, 12), img_buckets=(2, 8), aud_buckets=(4, 8, 16),
        shuffle=False,
    )
    trimmed = next(it2)
    full = collate([corpus[i] for i in [0, 1]])  # shuffle=False: first batch
    lp_t, picks_t = mmbidaf_decode(
        params,
        apply_frontend(fe, {k: jnp.asarray(v) for k, v in trimmed.items()},
                       cfg, TINY_SPEC),
        cfg,
    )
    lp_f, picks_f = mmbidaf_decode(
        params,
        apply_frontend(fe, {k: jnp.asarray(v) for k, v in full.items()},
                       cfg, TINY_SPEC),
        cfg,
    )
    np.testing.assert_array_equal(np.asarray(picks_t), np.asarray(picks_f))
    T_s = trimmed["sent_mask"].shape[1]
    np.testing.assert_allclose(
        np.asarray(lp_t), np.asarray(lp_f)[:, :, :T_s], rtol=2e-4, atol=1e-5
    )

    # sp_audio alignment (seq_align=num_seq): every audio bucket — even an
    # explicitly unaligned ladder — rounds UP to a multiple, so the SP
    # frontend's num_frames % num_seq check can never kill a run mid-epoch
    it3 = bucketed_iterator(
        corpus, batch_size=2, buckets=(4, 8), seed=0,
        aud_buckets=(3, 5, 16), seq_align=2,
    )
    for _ in range(4):
        assert next(it3)["aud_mask"].shape[1] % 2 == 0
    # an unaligned max_audio_frames cap fails at startup, not mid-epoch
    with pytest.raises(ValueError, match="seq_align"):
        next(bucketed_iterator(corpus, batch_size=2, buckets=(4,),
                               seq_align=3))

    # lengths are cached on the corpus: a second iterator construction does
    # no corpus IO (delete the files and construct again)
    assert len(corpus._lengths) == len(corpus)
    import shutil

    for v in range(len(specs)):
        shutil.rmtree(tmp_path / f"video{v}" / "frames")
        os.remove(tmp_path / f"video{v}" / "audio.wav")
    bucketed_iterator(corpus, batch_size=2, buckets=(4, 8), seed=1)


def test_bucketed_iterator_decode_rows(tmp_path, rng):
    """Multi-host local decode (parallel.mesh.local_batch_rows →
    bucketed_iterator decode_rows): named rows equal the full decode
    bit-for-bit, other rows are zero-filled shape placeholders (identical
    bucket choices — metadata-driven), so each host decodes only 1/H of
    every batch."""
    import dataclasses

    from PIL import Image

    from mmbidaf_tpu.data.pipeline import VideoCorpus, bucketed_iterator
    from mmbidaf_tpu.data.vocab import vocab_from_corpus_dir

    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, max_sentences=8, max_words=12, max_audio_frames=16
        ),
    )
    d = cfg.data
    n_samples = d.max_audio_frames * d.hop_length + d.win_length
    for v, n_s in enumerate([3, 4, 6, 8]):
        vd = tmp_path / f"video{v}"
        (vd / "frames").mkdir(parents=True)
        Image.fromarray((rng.random((12, 16, 3)) * 255).astype(np.uint8)).save(
            vd / "frames" / "f000.png"
        )
        sig = (rng.standard_normal(n_samples) * 8000).astype(np.int16)
        with wave_mod.open(str(vd / "audio.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(d.sample_rate)
            w.writeframes(sig.tobytes())
        sents = [f"Video {v} sentence {j} covers topic {j}." for j in range(n_s)]
        (vd / "transcript.txt").write_text(" ".join(sents))
        (vd / "summary.txt").write_text(sents[0])

    w2i = vocab_from_corpus_dir(str(tmp_path))
    corpus = VideoCorpus(str(tmp_path), cfg, w2i)

    kw = dict(batch_size=4, buckets=(4, 8), seed=5)
    it_full = bucketed_iterator(corpus, **kw)
    it_local = bucketed_iterator(corpus, decode_rows=[1, 2], **kw)
    for _ in range(4):
        full, loc = next(it_full), next(it_local)
        assert full.keys() == loc.keys()
        for k in full:
            assert full[k].shape == loc[k].shape, k  # same bucket choices
            np.testing.assert_array_equal(loc[k][[1, 2]], full[k][[1, 2]],
                                          err_msg=k)
            assert not loc[k][[0, 3]].any(), k  # placeholders, never decoded

    with pytest.raises(ValueError, match="decode_rows"):
        next(bucketed_iterator(corpus, decode_rows=[7], **kw))


def test_precomputed_features_roundtrip(disk_corpus):
    """tools/precompute_features.py artifacts: VideoCorpus auto-serves
    features.npz (no media decode), batches skip the frontend, and the
    features equal a direct apply_frontend of the raw batch."""
    import dataclasses
    import subprocess
    import sys

    import jax
    import jax.numpy as jnp

    from mmbidaf_tpu.data.frontend import apply_frontend, frontend_init
    from mmbidaf_tpu.data.pipeline import VideoCorpus, collate
    from mmbidaf_tpu.data.vocab import vocab_from_corpus_dir
    from mmbidaf_tpu.ops.vgg import TINY_SPEC

    root, cfg = disk_corpus
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, img_feat_dim=32,
                                       audio_feat_dim=cfg.data.n_mfcc)
    )
    import json
    cfg_path = os.path.join(root, "..", "cfg.json")
    from mmbidaf_tpu.config import config_to_dict
    with open(cfg_path, "w") as f:
        json.dump(config_to_dict(cfg), f)

    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run(
        [sys.executable, "tools/precompute_features.py", "--data_dir", root,
         "--config_json", cfg_path, "--vgg", "tiny", "--batch", "2"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=600,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "wrote features.npz for 3 videos" in res.stdout

    w2i = vocab_from_corpus_dir(root)
    pre = VideoCorpus(root, cfg, w2i)            # auto-detects features.npz
    raw = VideoCorpus(root, cfg, w2i, use_precomputed=False)
    ex = pre[0]
    assert "images" in ex and "frames" not in ex
    assert ex["images"].shape == (cfg.data.max_keyframes, cfg.model.img_feat_dim)

    # features == direct frontend of the raw example (same init seed)
    fe = frontend_init(jax.random.key(224 + 2), cfg, vgg_spec=TINY_SPEC)
    raw_b = {k: jnp.asarray(v) for k, v in collate([raw[0]]).items()}
    feat = apply_frontend(fe, raw_b, cfg, TINY_SPEC)
    np.testing.assert_allclose(
        np.asarray(feat["images"][0]), ex["images"], rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(feat["audio"][0]), ex["audio"], rtol=2e-4, atol=2e-4
    )

    # featurized batches pass through apply_frontend untouched
    pre_b = {k: jnp.asarray(v) for k, v in collate([pre[0]]).items()}
    out = apply_frontend(fe, pre_b, cfg, TINY_SPEC)
    np.testing.assert_array_equal(np.asarray(out["images"]), np.asarray(pre_b["images"]))


def test_grain_loader(disk_corpus):
    """grain DataLoader over VideoCorpus yields batched raw examples."""
    import dataclasses

    root, cfg = disk_corpus
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, img_feat_dim=32)
    )
    corpus_tokens = []
    for vid in sorted(os.listdir(root)):
        with open(os.path.join(root, vid, "transcript.txt")) as f:
            for s in text.sent_tokenize(f.read()):
                corpus_tokens.append(text.word_tokenize(s))
    w2i = vocab.build_vocab(corpus_tokens)
    corpus = VideoCorpus(root, cfg, w2i)

    from mmbidaf_tpu.data.pipeline import make_grain_loader

    loader = make_grain_loader(corpus, batch_size=2, seed=0)
    batch = next(iter(loader))
    assert batch["text_ids"].shape[0] == 2
    assert batch["frames"].shape[0] == 2
    assert batch["targets"].shape == (2, cfg.model.max_decode_steps)


def test_grain_loader_parallel_workers(disk_corpus):
    """worker_count>0 decodes in subprocesses (the reference's DataLoader
    num_workers equivalent) and yields byte-identical batches to the
    in-process loader under the same sampler seed; num_epochs bounds the
    stream."""
    import dataclasses

    from mmbidaf_tpu.data.pipeline import VideoCorpus, make_grain_loader

    root, cfg = disk_corpus
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, img_feat_dim=32)
    )
    w2i = vocab.build_vocab(
        [text.word_tokenize(s) for s in ["sentence video topic talks about"]]
    )
    corpus = VideoCorpus(root, cfg, w2i)

    # batch_size=1: grain's round-robin worker interleaving reproduces the
    # sampler order exactly, so serial and parallel streams are identical.
    serial = list(make_grain_loader(corpus, 1, seed=0, worker_count=0, num_epochs=2))
    parallel = list(make_grain_loader(corpus, 1, seed=0, worker_count=2, num_epochs=2))
    assert len(serial) == len(parallel) == 6  # 3 videos x 2 epochs
    for bs, bp in zip(serial, parallel):
        for k in bs:
            np.testing.assert_array_equal(bs[k], np.asarray(bp[k]))

    # batching happens inside each worker (per-worker drop_remainder): 2
    # workers x 3 records -> one full batch-of-2 each
    batched = list(make_grain_loader(corpus, 2, seed=0, worker_count=2, num_epochs=2))
    assert len(batched) == 2
    assert all(b["text_ids"].shape[0] == 2 for b in batched)


def test_grain_state_translates_across_worker_topologies(disk_corpus):
    """Round-3 review item: a loader snapshot restores under a DIFFERENT
    worker_count via translate_grain_state — no record skipped for the
    epoch (a bounded tail may repeat), and unusable formats raise an
    actionable error instead of silently restarting."""
    import json

    import pytest as _pytest

    from mmbidaf_tpu.data.pipeline import (
        VideoCorpus, make_grain_loader, translate_grain_state,
    )

    root, cfg = disk_corpus
    corpus_tokens = []
    for vid in sorted(os.listdir(root)):
        with open(os.path.join(root, vid, "transcript.txt")) as f:
            for s in text.sent_tokenize(f.read()):
                corpus_tokens.append(text.word_tokenize(s))
    w2i = vocab.build_vocab(corpus_tokens)
    corpus = VideoCorpus(root, cfg, w2i)
    n = len(corpus)

    def record_ids(batch):
        # identify records by their text ids' first row (unique per video)
        return [tuple(np.asarray(batch["text_ids"])[i, 0, :4].tolist())
                for i in range(np.asarray(batch["text_ids"]).shape[0])]

    all_ids = {tuple(np.asarray(corpus[i]["text_ids"])[0, :4].tolist())
               for i in range(n)}

    for w_from, w_to in ((0, 2), (2, 0)):
        # consume one batch in the source topology, snapshot
        it = iter(make_grain_loader(corpus, 1, seed=0, worker_count=w_from,
                                    num_epochs=1))
        seen = record_ids(next(it))
        state = it.get_state()

        # native restore under the new topology fails (grain's own check)…
        it2 = iter(make_grain_loader(corpus, 1, seed=0, worker_count=w_to,
                                     num_epochs=1))
        with _pytest.raises(ValueError, match="[Ww]orker count"):
            it2.set_state(state)

        # …but the translated state restores, and the rest of the epoch
        # together with what was already seen covers EVERY record
        new_state, repeats = translate_grain_state(state, w_to, batch_size=1)
        assert json.loads(new_state)["worker_count"] == w_to
        assert 0 <= repeats <= len(seen)
        it3 = iter(make_grain_loader(corpus, 1, seed=0, worker_count=w_to,
                                     num_epochs=1))
        it3.set_state(new_state)
        rest = [rid for b in it3 for rid in record_ids(b)]
        assert set(seen) | set(rest) == all_ids, (w_from, w_to)
        # repeats bound honored: nothing seen more than twice
        assert len(rest) <= n  # no runaway duplication

    # unusable snapshot: actionable error
    bad = json.dumps({"version": 99}).encode()
    with _pytest.raises(ValueError, match="loader_workers"):
        translate_grain_state(bad, 2, batch_size=1)


def test_iterator_skip_resumes_data_order(disk_corpus):
    """skip=k yields exactly the stream with its first k batches dropped —
    deterministic data-order resume after preemption, without touching the
    corpus for the skipped batches."""
    from itertools import islice

    from mmbidaf_tpu.data.pipeline import VideoCorpus, batched_iterator, bucketed_iterator

    root, cfg = disk_corpus
    corpus_tokens = []
    for vid in sorted(os.listdir(root)):
        with open(os.path.join(root, vid, "transcript.txt")) as f:
            for s in text.sent_tokenize(f.read()):
                corpus_tokens.append(text.word_tokenize(s))
    w2i = vocab.build_vocab(corpus_tokens)
    corpus = VideoCorpus(root, cfg, w2i)

    for make in (
        lambda skip: batched_iterator(corpus, 2, seed=7, skip=skip),
        lambda skip: bucketed_iterator(corpus, 2, (4, 8), seed=7, skip=skip),
    ):
        full = list(islice(make(0), 7))
        resumed = list(islice(make(4), 3))
        for a_b, b_b in zip(full[4:], resumed):
            assert a_b.keys() == b_b.keys()
            for k in a_b:
                np.testing.assert_array_equal(a_b[k], b_b[k])


def test_batched_iterator_small_corpus_still_fills_batch(disk_corpus):
    """Wrap-padding must fill the batch even when the corpus is smaller
    than HALF the batch (n=3, batch 8 used to yield a short batch of 6 —
    one recompile per shape and broken mesh/grad_accum divisibility)."""
    from mmbidaf_tpu.data import text, vocab
    from mmbidaf_tpu.data.pipeline import VideoCorpus, batched_iterator

    root, cfg = disk_corpus
    corpus_tokens = []
    for vid in sorted(os.listdir(root)):
        with open(os.path.join(root, vid, "transcript.txt")) as f:
            for s in text.sent_tokenize(f.read()):
                corpus_tokens.append(text.word_tokenize(s))
    w2i = vocab.build_vocab(corpus_tokens)
    corpus = VideoCorpus(root, cfg, w2i)
    assert len(corpus) == 3
    for bs in (7, 8):
        batch = next(batched_iterator(corpus, batch_size=bs, seed=0))
        assert batch["frames"].shape[0] == bs


def test_build_vocab_max_size_caps_total_vocab():
    """max_size bounds the WHOLE vocabulary (PAD/OOV included): the
    embedding table is sized len(word2idx), so exceeding the configured
    vocab_size by the two specials broke buffer-size agreement."""
    from mmbidaf_tpu.data import vocab

    tokens = [[f"w{i}" for i in range(20)]]
    w2i = vocab.build_vocab(tokens, max_size=10)
    assert len(w2i) == 10
    assert w2i[vocab.PAD_TOKEN] == vocab.PAD_ID
    assert w2i[vocab.OOV_TOKEN] == vocab.OOV_ID
    # no cap → everything
    assert len(vocab.build_vocab(tokens)) == 22


def test_decode_video_ffmpeg_stride_and_extract(monkeypatch, tmp_path):
    """The corpus importers sample by SOURCE-FRAME stride: decode_video_ffmpeg
    must accept every_n/max_frames (extract_media_to_dir passes them — used
    to raise TypeError on any machine where ffmpeg exists) and build the
    exact select-filter command."""
    from mmbidaf_tpu.data import video as vid

    captured = []

    class _R:
        def __init__(self, stdout):
            self.stdout = stdout

    def fake_run(cmd, capture_output=True, check=True):
        captured.append(cmd)
        if "-pix_fmt" in cmd:  # video pipe: 2 frames of 240x320 rgb24
            return _R(bytes(2 * 240 * 320 * 3))
        return _R(np.zeros(16000, np.float32).tobytes())  # audio pipe

    monkeypatch.setattr(vid, "ffmpeg_available", lambda: True)
    monkeypatch.setattr(vid.subprocess, "run", fake_run)

    frames = vid.decode_video_ffmpeg("x.mp4", every_n=30, max_frames=64)
    assert frames.shape == (2, 240, 320, 3)
    vf = captured[0][captured[0].index("-vf") + 1]
    assert "select=not(mod(n\\,30))" in vf
    assert captured[0][captured[0].index("-frames:v") + 1] == "64"

    vdir = tmp_path / "v0"
    vdir.mkdir()
    assert vid.extract_media_to_dir("x.mp4", str(vdir), every_n=30, max_frames=64)
    assert (vdir / "audio.wav").exists()
    assert len(list((vdir / "frames").iterdir())) == 2
