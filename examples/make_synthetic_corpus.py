"""Create a small synthetic on-disk video corpus for demos and smoke runs.

Each "video" gets PNG keyframes, a WAV audio track (mixed sine tones),
a transcript, and a gold abstractive summary — the corpus layout
``VideoCorpus`` consumes (SURVEY.md §1: corpus-agnostic data layer).

    python examples/make_synthetic_corpus.py --out /tmp/corpus --videos 8
    python train.py --data_dir /tmp/corpus --num_steps 50
"""

from __future__ import annotations

import argparse
import os
import sys
import wave as wave_mod

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOPICS = [
    "gradient descent", "attention mechanisms", "tensor processing units",
    "sequence models", "data pipelines", "mel spectrograms",
    "pointer networks", "highway networks",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--videos", type=int, default=8)
    ap.add_argument("--sentences", type=int, default=12)
    ap.add_argument("--ragged", action="store_true",
                    help="vary sentence count per video in [3, --sentences] "
                         "(for bucketed-shape runs)")
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--seconds", type=float, default=4.0)
    ap.add_argument("--sample_rate", type=int, default=16000)
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args()

    from PIL import Image

    rng = np.random.default_rng(a.seed)
    for v in range(a.videos):
        vd = os.path.join(a.out, f"video{v:03d}")
        os.makedirs(os.path.join(vd, "frames"), exist_ok=True)
        for i in range(a.frames):
            # colored gradient frames so VGG features vary per video
            x = np.broadcast_to(np.linspace(0, 1, 64)[None, :, None], (48, 64, 1))
            y = np.broadcast_to(np.linspace(0, 1, 48)[:, None, None], (48, 64, 1))
            base = np.concatenate(
                [x * ((v + 1) % 3 + 1) / 3, y * ((v + 2) % 3 + 1) / 3,
                 np.full((48, 64, 1), (i + 1) / a.frames)], axis=2
            )
            noise = rng.random((48, 64, 3)) * 0.2
            arr = ((base + noise).clip(0, 1) * 255).astype(np.uint8)
            Image.fromarray(arr).save(os.path.join(vd, "frames", f"f{i:04d}.png"))

        t = np.arange(int(a.seconds * a.sample_rate)) / a.sample_rate
        freqs = 200 + 60 * np.asarray(rng.integers(1, 8, size=3))
        sig = sum(np.sin(2 * np.pi * f * t) for f in freqs) / 3
        pcm = (sig * 20000).astype(np.int16)
        with wave_mod.open(os.path.join(vd, "audio.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(a.sample_rate)
            w.writeframes(pcm.tobytes())

        n_sents = int(rng.integers(3, a.sentences + 1)) if a.ragged else a.sentences
        topics = rng.choice(TOPICS, size=n_sents)
        sents = [
            f"Lecture segment {j} explains {topics[j]} with a worked example."
            for j in range(n_sents)
        ]
        with open(os.path.join(vd, "transcript.txt"), "w") as f:
            f.write(" ".join(sents))
        key = sorted(rng.choice(n_sents, size=min(3, n_sents), replace=False))
        with open(os.path.join(vd, "summary.txt"), "w") as f:
            f.write(" ".join(sents[k] for k in key))
    print(f"wrote {a.videos} videos under {a.out}")


if __name__ == "__main__":
    main()
