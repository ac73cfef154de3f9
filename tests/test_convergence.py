"""Held-out convergence regression (VERDICT r3 item 1): the full trimodal
model trained on a LEARNABLE synthetic corpus must recover the gold picks
on held-out videos — generalization, not loss-only descent.

CPU-sized twin of the TPU run documented in docs/QUALITY.md
(experiments/quality_run.py drives both)."""

import numpy as np
import pytest

from mmbidaf_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from mmbidaf_tpu.ops.vgg import TINY_SPEC


@pytest.fixture(scope="module")
def learnable_corpus(tmp_path_factory):
    from examples.make_synthetic_corpus import make_corpus

    root = str(tmp_path_factory.mktemp("ql") / "corpus")
    make_corpus(root, videos=20, sentences=8, frames=6, seconds=2.0,
                seed=3, n_key=2, learnable=True, split=4)
    return root


def _cfg():
    return Config(
        data=DataConfig(max_sentences=8, max_words=12, max_keyframes=6,
                        max_audio_frames=32, vocab_size=256, image_size=32,
                        n_fft=256, win_length=256, hop_length=128),
        model=ModelConfig(hidden_size=24, img_feat_dim=48, audio_feat_dim=40,
                          max_decode_steps=2, vgg_variant="tiny"),
        train=TrainConfig(batch_size=8, lr=0.5),
    )


def test_heldout_pick_accuracy_converges(learnable_corpus):
    """300 adadelta steps: held-out pick overlap must rise from the random
    floor (~0.25 for K=2 of 8) to >= 0.75, and ROUGE-L must approach the
    oracle ceiling (1.0 — summaries are verbatim key sentences)."""
    from experiments.quality_run import run_quality

    final = run_quality(_cfg(), learnable_corpus, steps=300, batch=8,
                        eval_every=150, vgg_spec=TINY_SPEC, seed=0,
                        log=lambda *a, **k: None)
    assert final["floor"]["pick_overlap"] < 0.6  # untrained = near chance
    assert final["final"]["pick_overlap"] >= 0.75, final
    assert final["final"]["ROUGE-L"] >= 0.75, final
    assert final["final"]["ROUGE-L"] <= final["oracle_ceiling"]["ROUGE-L"] + 1e-6
    assert final["final"]["train_loss"] < 1.0


def test_learnable_corpus_has_signal(learnable_corpus):
    """The corpus generator's contract: key sentences are marked (text
    markers + gold summary verbatim) so the task is learnable at all."""
    import os

    train = os.path.join(learnable_corpus, "train")
    vids = sorted(os.listdir(train))
    assert len(vids) == 16 and len(os.listdir(
        os.path.join(learnable_corpus, "dev"))) == 4
    with open(os.path.join(train, vids[0], "transcript.txt")) as f:
        transcript = f.read()
    with open(os.path.join(train, vids[0], "summary.txt")) as f:
        summary = f.read()
    # summary sentences appear verbatim in the transcript (oracle = 1.0)
    for s in summary.split(". "):
        assert s.split(".")[0] in transcript
    # marker words separate key sentences from fillers
    low = summary.lower()
    assert ("crucially" in low or "importantly" in low)


def test_pick_metrics_shapes():
    from experiments.quality_run import pick_metrics

    picks = np.array([[1, 3], [0, 2]])
    targets = np.array([[1, 3], [5, 6]])
    mask = np.array([[1.0, 1.0], [1.0, 0.0]])
    m = pick_metrics(picks, targets, mask)
    assert m["pick_overlap"] == pytest.approx(0.5)  # (2/2 + 0/1) / 2
    assert m["pick_exact"] == pytest.approx(0.5)
    assert m["n"] == 2
