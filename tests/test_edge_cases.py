"""Edge cases: degenerate transcripts, single-sentence videos, empty audio,
minimum-size batches — the ragged extremes real corpora produce.
"""

import numpy as np

import jax
import jax.numpy as jnp

from mmbidaf_tpu.config import tiny_test_config
from mmbidaf_tpu.data.synthetic import random_word_vectors, synthetic_batch
from mmbidaf_tpu.data.text import encode_transcript, sent_tokenize, word_tokenize
from mmbidaf_tpu.data.labels import make_targets
from mmbidaf_tpu.models.mmbidaf import mmbidaf_decode, mmbidaf_init


def test_empty_and_whitespace_transcripts():
    w2i = {"--PAD--": 0, "--OOV--": 1, "hello": 2}
    for text in ("", "   ", "\n\n"):
        enc = encode_transcript(text, w2i, max_sentences=4, max_words=3)
        assert enc["sent_mask"].sum() == 0
        assert enc["text_ids"].sum() == 0
    assert sent_tokenize("") == []
    assert word_tokenize("") == []


def test_single_sentence_video_decodes():
    """A video with exactly one valid sentence: every decode step must pick
    it (mask_selected re-picks the only available sentence once all are
    consumed — the -1e30 mask keeps softmax finite)."""
    cfg = tiny_test_config()
    rng = np.random.default_rng(0)
    wv = random_word_vectors(rng, cfg.data.vocab_size, cfg.model.emb_dim)
    params = mmbidaf_init(jax.random.key(0), cfg, jnp.asarray(wv))
    batch = synthetic_batch(rng, cfg, batch_size=2)
    # truncate example 1 to a single valid sentence
    batch["sent_mask"][1, 1:] = 0.0
    batch["word_mask"][1, 1:] = 0.0
    batch["text_ids"][1, 1:] = 0
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    log_p, picks = mmbidaf_decode(params, jbatch, cfg)
    assert np.isfinite(np.asarray(log_p)[1][np.asarray(log_p)[1] > -1e20]).all()
    assert (np.asarray(picks)[1] == 0).all()


def test_silent_audio_is_finite():
    """All-zero waveform → log/dB guards keep mel/MFCC finite."""
    from mmbidaf_tpu.ops import audio

    consts = audio.make_audio_frontend_consts(16000, 256, 200, 24, 13)
    sig = jnp.zeros((1, 64 * 160 + 200), jnp.float32)
    for feature in ("mfcc", "logmel"):
        out = audio.waveform_to_features(sig, consts, 200, 160, 64, feature=feature)
        assert np.isfinite(np.asarray(out)).all()


def test_gold_labels_degenerate_inputs():
    # empty summary
    idxs, mask = make_targets([["a", "b"], ["c"]], [], k=2)
    assert len(idxs) == 2
    # all-empty sentences
    idxs, mask = make_targets([[], []], ["x"], k=2)
    assert len(idxs) == 2 and (idxs >= 0).all()
    # fewer sentences than k → padding repeats, mask flags the real ones
    idxs, mask = make_targets([["just", "one"]], ["just", "one"], k=3)
    assert idxs.tolist() == [0, 0, 0]
    assert mask[0] == 1.0


def test_batch_size_one():
    cfg = tiny_test_config()
    rng = np.random.default_rng(3)
    wv = random_word_vectors(rng, cfg.data.vocab_size, cfg.model.emb_dim)
    params = mmbidaf_init(jax.random.key(3), cfg, jnp.asarray(wv))
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(rng, cfg, batch_size=1).items()}
    log_p, picks = mmbidaf_decode(params, batch, cfg)
    assert picks.shape == (1, cfg.model.max_decode_steps)
