"""Create a small synthetic on-disk video corpus for demos and smoke runs.

Each "video" gets PNG keyframes, a WAV audio track (mixed sine tones),
a transcript, and a gold abstractive summary — the corpus layout
``VideoCorpus`` consumes (SURVEY.md §1: corpus-agnostic data layer).

    python examples/make_synthetic_corpus.py --out /tmp/corpus --videos 8
    python train.py --data_dir /tmp/corpus --num_steps 50

``--learnable`` makes the pick task LEARNABLE rather than arbitrary: key
sentences (the gold summary) carry marker phrasing, the keyframes aligned
with key-sentence positions get a bright saliency band, and the audio gets
a high tone burst over the same spans — so a trained model's held-out
pick-accuracy measures real generalization, not memorization
(docs/QUALITY.md, VERDICT r3 item 1). ``--split N`` additionally writes
``train/``/``dev/`` subdirs (the layout train.py/infer.py special-case)
with N dev videos held out.
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

# --learnable templates: key sentences carry marker words ("crucially",
# "takeaway", "conclusion"); fillers share the topic vocabulary so ONLY the
# markers (and the aligned image/audio cues) separate the classes.
FILLER_TEMPLATES = [
    "Lecture segment {j} explains {topic} with a worked example.",
    "The speaker then reviews {topic} on the next slide.",
    "A short aside mentions {topic} in passing.",
    "Notation for {topic} appears on the board.",
]
KEY_TEMPLATES = [
    "Crucially the main takeaway is that {topic} drives the final result.",
    "Importantly the central conclusion is that {topic} matters most here.",
]


def write_video(
    vd: str,
    rng: np.random.Generator,
    v: int,
    n_sents: int,
    n_frames: int,
    seconds: float,
    sample_rate: int,
    n_key: int,
    learnable: bool,
) -> None:
    from PIL import Image

    key = np.sort(rng.choice(n_sents, size=min(n_key, n_sents), replace=False))
    key_set = set(int(k) for k in key)

    os.makedirs(os.path.join(vd, "frames"), exist_ok=True)
    for i in range(n_frames):
        # colored gradient frames so VGG features vary per video
        x = np.broadcast_to(np.linspace(0, 1, 64)[None, :, None], (48, 64, 1))
        y = np.broadcast_to(np.linspace(0, 1, 48)[:, None, None], (48, 64, 1))
        base = np.concatenate(
            [x * ((v + 1) % 3 + 1) / 3, y * ((v + 2) % 3 + 1) / 3,
             np.full((48, 64, 1), (i + 1) / n_frames)], axis=2
        )
        noise = rng.random((48, 64, 3)) * 0.2
        arr = (base + noise).clip(0, 1)
        if learnable:
            # saliency cue: frames aligned with a key sentence's relative
            # position get a bright band (visible to any conv featurizer)
            sent_at_frame = int(i * n_sents / n_frames)
            if sent_at_frame in key_set:
                arr[8:16, :, :] = 1.0
        Image.fromarray((arr * 255).astype(np.uint8)).save(
            os.path.join(vd, "frames", f"f{i:04d}.png")
        )

    n_samp = int(seconds * sample_rate)
    t = np.arange(n_samp) / sample_rate
    freqs = 200 + 60 * np.asarray(rng.integers(1, 8, size=3))
    sig = sum(np.sin(2 * np.pi * f * t) for f in freqs) / 3
    if learnable:
        # tone-burst cue over each key sentence's time span
        burst = np.zeros(n_samp)
        for k in key_set:
            a = int(k * n_samp / n_sents)
            b = int((k + 1) * n_samp / n_sents)
            burst[a:b] = np.sin(2 * np.pi * 3000 * t[a:b])
        sig = 0.6 * sig + 0.4 * burst
    pcm = (sig * 20000).astype(np.int16)
    with wave_mod.open(os.path.join(vd, "audio.wav"), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())

    topics = rng.choice(TOPICS, size=n_sents)
    sents = []
    for j in range(n_sents):
        if learnable:
            tpl = (KEY_TEMPLATES[int(rng.integers(len(KEY_TEMPLATES)))]
                   if j in key_set else
                   FILLER_TEMPLATES[int(rng.integers(len(FILLER_TEMPLATES)))])
            sents.append(tpl.format(j=j, topic=topics[j]))
        else:
            sents.append(
                f"Lecture segment {j} explains {topics[j]} with a worked example."
            )
    with open(os.path.join(vd, "transcript.txt"), "w") as f:
        f.write(" ".join(sents))
    with open(os.path.join(vd, "summary.txt"), "w") as f:
        f.write(" ".join(sents[int(k)] for k in key))


def make_corpus(
    out: str,
    videos: int = 8,
    sentences: int = 12,
    ragged: bool = False,
    frames: int = 10,
    seconds: float = 4.0,
    sample_rate: int = 16000,
    seed: int = 0,
    n_key: int = 3,
    learnable: bool = False,
    split: int = 0,
) -> None:
    rng = np.random.default_rng(seed)
    for v in range(videos):
        if split:
            sub = "dev" if v >= videos - split else "train"
            vd = os.path.join(out, sub, f"video{v:03d}")
        else:
            vd = os.path.join(out, f"video{v:03d}")
        n_sents = int(rng.integers(3, sentences + 1)) if ragged else sentences
        write_video(vd, rng, v, n_sents, frames, seconds, sample_rate,
                    n_key, learnable)


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
    ap.add_argument("--keys", type=int, default=3,
                    help="gold summary sentences per video")
    ap.add_argument("--learnable", action="store_true",
                    help="key sentences carry marker text + aligned "
                         "image/audio cues (held-out generalization demos)")
    ap.add_argument("--split", type=int, default=0, metavar="N_DEV",
                    help="write train/ and dev/ subdirs, holding out N videos")
    a = ap.parse_args()

    make_corpus(a.out, a.videos, a.sentences, a.ragged, a.frames, a.seconds,
                a.sample_rate, a.seed, a.keys, a.learnable, a.split)
    print(f"wrote {a.videos} videos under {a.out}"
          + (f" (train/dev split, {a.split} held out)" if a.split else ""))


if __name__ == "__main__":
    main()
