"""Per-modality tower ablation regression (VERDICT r4 item 1): on a
split-cue corpus — where image-cued key sentences read like fillers and
are identifiable ONLY via the saliency band on their topic-matched
keyframes — the image tower must recover image-cued picks and the
text-only model must not.

CPU-sized twin of the TPU sweep in docs/QUALITY.md
(experiments/ablation_sweep.py drives both). Two-class corpus (text/image
cues, 2 keys, 2 decode steps) keeps the contrast sharp: after both models
master the text-marker key, the second pick hits an image-cued key at
~1/7 ≈ 0.14 by chance without the tower, vs ~0.45 measured with it.
Everything is seeded, so the thresholds are deterministic modulo XLA
scheduling; margins sit ≥ 0.1 from the probe-measured values
(with-tower 0.44-0.50 from step 2000 on, without 0.19 steady).
"""

import json
import os

import pytest

from mmbidaf_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from mmbidaf_tpu.ops.vgg import TINY_SPEC


@pytest.fixture(scope="module")
def split_corpus(tmp_path_factory):
    from examples.make_synthetic_corpus import make_corpus

    root = str(tmp_path_factory.mktemp("abl") / "corpus")
    # seconds matches the featurized audio window (32*128+256 samples) so
    # no sentence's audio span is cropped by the loader
    make_corpus(root, videos=100, sentences=8, frames=8, seconds=4352 / 16000,
                seed=3, n_key=2, learnable=True, split=16, cue_mode="split",
                cue_classes=("text", "image"))
    return root


def _cfg(use_images: bool):
    return Config(
        data=DataConfig(max_sentences=8, max_words=12, max_keyframes=8,
                        max_audio_frames=32, vocab_size=256, image_size=32,
                        n_fft=256, win_length=256, hop_length=128,
                        audio_features="logmel"),
        model=ModelConfig(hidden_size=24, img_feat_dim=48, audio_feat_dim=64,
                          max_decode_steps=2, vgg_variant="tiny",
                          use_images=use_images, use_audio=False),
        train=TrainConfig(batch_size=8, lr=0.5),
    )


def test_split_corpus_hides_cues_from_text(split_corpus):
    """Corpus contract: image-cued key sentences use FILLER templates (no
    marker words), so transcript text alone cannot identify them."""
    train = os.path.join(split_corpus, "train")
    vids = sorted(os.listdir(train))
    seen_classes = set()
    for vid in vids:
        vd = os.path.join(train, vid)
        with open(os.path.join(vd, "cues.json")) as f:
            cues = json.load(f)["cues"]
        with open(os.path.join(vd, "transcript.txt")) as f:
            transcript = f.read()
        sents = [s for s in transcript.split(". ") if s]
        for k, c in cues.items():
            seen_classes.add(c)
            marked = ("rucially" in sents[int(k)]) or ("mportantly" in sents[int(k)])
            assert marked == (c == "text"), (vid, k, c, sents[int(k)])
    assert seen_classes == {"text", "image"}


def test_image_cued_picks_need_the_image_tower(split_corpus):
    """Held-out image-cue recovery: >= 0.35 with the image tower, <= 0.30
    (vs ~1/7 chance) without it — the tower EARNS its place
    (SURVEY.md:57-64, configs 2-4)."""
    from experiments.quality_run import run_quality

    finals = {}
    for name, use_images in (("text+image", True), ("text", False)):
        finals[name] = run_quality(
            _cfg(use_images), split_corpus, steps=2500, batch=8,
            eval_every=1250, vgg_spec=TINY_SPEC, seed=0,
            log=lambda *a, **k: None)["final"]

    with_img = finals["text+image"]
    text_only = finals["text"]
    # both models master the text-marker keys
    assert with_img["recovered_text"] >= 0.85, finals
    assert text_only["recovered_text"] >= 0.85, finals
    # only the image tower recovers image-cued keys
    assert with_img["recovered_image"] >= 0.35, finals
    assert text_only["recovered_image"] <= 0.30, finals
    # and that lifts overall held-out pick quality
    assert with_img["pick_overlap"] > text_only["pick_overlap"], finals
