"""Dataset + collate (SURVEY.md §3.1 "Datasets + collate", §2 L2).

The reference's per-modality ``torch.utils.data.Dataset``/``DataLoader`` with
custom pad/collate becomes a corpus-agnostic source of **fixed-shape padded
batches** (XLA static shapes): a ``VideoCorpus`` over per-video asset dirs,
an index-based random-access source compatible with ``grain`` samplers, and
a plain batched iterator for environments without grain.

Each example is the *raw* schema (frames/waveform/text ids) consumed by the
jitted device frontend — preprocessing happens on-device, not here.
"""

from __future__ import annotations

import os
from typing import Iterator, Sequence

import numpy as np

from mmbidaf_tpu.config import Config
from mmbidaf_tpu.data.labels import make_targets
from mmbidaf_tpu.data.text import encode_transcript, word_tokenize
from mmbidaf_tpu.data.video import load_video_assets


class VideoCorpus:
    """Random-access corpus over ``root/<video_id>/`` asset directories.

    Implements ``__len__`` / ``__getitem__`` (the grain RandomAccessDataSource
    protocol), so it plugs into ``grain.MapDataset.source(...)`` directly.
    """

    def __init__(
        self,
        root: str,
        cfg: Config,
        word2idx: dict[str, int],
        require_summary: bool = False,
        use_precomputed: bool = True,
    ):
        self.root = root
        self.cfg = cfg
        self.word2idx = word2idx
        # Serve features.npz (tools/precompute_features.py artifacts — the
        # reference's preprocessed-.npy flow) when present: the train step
        # then skips the VGG/MFCC frontend entirely (batch schema is keyed
        # on frames/waveform presence).
        self.use_precomputed = use_precomputed
        self.video_ids = sorted(
            d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
        )
        if require_summary:
            # Training needs gold labels (targets derive from summary.txt);
            # unlabeled videos are skipped with a notice.
            labeled = [
                v for v in self.video_ids
                if os.path.isfile(os.path.join(root, v, "summary.txt"))
            ]
            if len(labeled) < len(self.video_ids):
                skipped = sorted(set(self.video_ids) - set(labeled))
                print(f"VideoCorpus: skipping {len(skipped)} unlabeled "
                      f"video(s) (no summary.txt): {skipped[:5]}...")
            self.video_ids = labeled
        if not self.video_ids:
            raise FileNotFoundError(f"no usable video dirs under {root}")
        d = cfg.data
        self.num_audio_samples = d.max_audio_frames * d.hop_length + d.win_length

    def __repr__(self) -> str:
        # Stable across processes: grain validates checkpointed loader
        # state by repr(data_source); the default object repr embeds the
        # memory address and never matches on resume.
        return (f"VideoCorpus(root={self.root!r}, n={len(self.video_ids)}, "
                f"precomputed={self.use_precomputed})")

    def __len__(self) -> int:
        return len(self.video_ids)

    def __getitem__(self, idx: int) -> dict[str, np.ndarray]:
        d, m = self.cfg.data, self.cfg.model
        vdir = os.path.join(self.root, self.video_ids[idx])
        fpath = os.path.join(vdir, "features.npz")
        precomputed = self.use_precomputed and os.path.exists(fpath)
        assets = load_video_assets(
            vdir,
            d.max_keyframes,
            self.num_audio_samples,
            media=not precomputed,
            keyframe_policy=d.keyframe_policy,
        )
        enc = encode_transcript(
            assets["transcript"], self.word2idx, d.max_sentences, d.max_words
        )
        ex = {
            "text_ids": enc["text_ids"],
            "word_mask": enc["word_mask"],
            "sent_mask": enc["sent_mask"],
        }
        if precomputed:
            with np.load(fpath) as z:
                ex["images"] = z["images"].astype(np.float32)
                ex["audio"] = z["audio"].astype(np.float32)
                ex["img_mask"] = z["img_mask"].astype(np.float32)
                ex["aud_mask"] = z["aud_mask"].astype(np.float32)
        else:
            ex["frames"] = assets["frames"]
            ex["img_mask"] = assets["img_mask"]
            ex["waveform"] = assets["waveform"]
            # full waveform is padded to cover all frames
            ex["aud_mask"] = np.ones((d.max_audio_frames,), np.float32)
        if assets["summary"] is not None:
            sent_tokens = [word_tokenize(s) for s in enc["sentences"]]
            # pad token lists to T_s so indices line up with sent_mask
            sent_tokens += [[]] * (d.max_sentences - len(sent_tokens))
            targets, target_mask = make_targets(
                sent_tokens, word_tokenize(assets["summary"]), m.max_decode_steps
            )
            ex["targets"] = targets
            ex["target_mask"] = target_mask
        return ex


    def example_text(self, idx: int) -> tuple[list[str], str | None]:
        """The idx-th video's real transcript sentences (truncated/ordered
        exactly like ``__getitem__``'s token ids) and its gold summary text,
        for host-side summary assembly + ROUGE (SURVEY.md §4.3: decode →
        indices → sentences → summary string → ROUGE vs gold).

        Reads only transcript.txt / summary.txt — no frame or audio decode.
        """
        from mmbidaf_tpu.data.text import sent_tokenize

        vdir = os.path.join(self.root, self.video_ids[idx])
        with open(os.path.join(vdir, "transcript.txt")) as f:
            sentences = sent_tokenize(f.read())[: self.cfg.data.max_sentences]
        summary = None
        spath = os.path.join(vdir, "summary.txt")
        if os.path.isfile(spath):
            with open(spath) as f:
                summary = f.read().strip()
        return sentences, summary


def collate(examples: Sequence[dict]) -> dict[str, np.ndarray]:
    """Stack fixed-shape examples into one padded batch."""
    keys = examples[0].keys()
    return {k: np.stack([e[k] for e in examples]) for k in keys}


def batched_iterator(
    corpus: VideoCorpus,
    batch_size: int,
    seed: int = 0,
    shuffle: bool = True,
    drop_remainder: bool = True,
    skip: int = 0,
) -> Iterator[dict[str, np.ndarray]]:
    """Epoch-less batched stream (repeats forever, reshuffling per epoch).

    The last short batch is padded by wrapping (XLA static batch shapes).
    ``skip`` fast-forwards that many batches WITHOUT touching the corpus
    (index arithmetic only) — deterministic data-order resume after
    preemption: ``skip=k`` yields exactly what batch k+1 onward would be.
    """
    rng = np.random.default_rng(seed)
    n = len(corpus)
    skipped = 0
    while True:
        order = rng.permutation(n) if shuffle else np.arange(n)
        for start in range(0, n, batch_size):
            idxs = order[start : start + batch_size]
            if len(idxs) < batch_size:
                if drop_remainder and n >= batch_size:
                    continue
                idxs = np.concatenate([idxs, order[: batch_size - len(idxs)]])
            if skipped < skip:
                skipped += 1
                continue
            yield collate([corpus[int(i)] for i in idxs])


def bucket_for(count: int, buckets: Sequence[int]) -> int:
    """Smallest bucket holding ``count`` sentences (largest bucket caps)."""
    for b in buckets:
        if count <= b:
            return b
    return buckets[-1]


def bucketed_iterator(
    corpus: VideoCorpus,
    batch_size: int,
    buckets: Sequence[int],
    seed: int = 0,
    shuffle: bool = True,
    skip: int = 0,
) -> Iterator[dict[str, np.ndarray]]:
    """Bucketed-shape batched stream (SURVEY.md §8 ground rules / risk R3).

    Examples are grouped by transcript sentence count into the smallest
    fitting bucket; each batch's text arrays are trimmed to its bucket's
    T_sent, so ragged corpora stop paying worst-case padding on every
    batch. XLA compiles one program per bucket shape (jit caches by shape
    — the per-bucket "jit cache" is free); frames/audio keep their static
    shapes. Short buckets wrap-fill like ``batched_iterator``.
    """
    buckets = sorted({min(b, corpus.cfg.data.max_sentences) for b in buckets})
    if not buckets:
        raise ValueError("need at least one bucket")
    counts = [len(corpus.example_text(i)[0]) for i in range(len(corpus))]
    groups: dict[int, list[int]] = {}
    for i, n in enumerate(counts):
        groups.setdefault(bucket_for(n, buckets), []).append(i)

    def trim(ex: dict, b: int) -> dict:
        out = dict(ex)
        for k in ("text_ids", "word_mask", "sent_mask"):
            out[k] = ex[k][:b]
        return out

    rng = np.random.default_rng(seed)
    skipped = 0
    while True:
        # One epoch: per-bucket shuffled batches, bucket order interleaved.
        epoch: list[tuple[int, np.ndarray]] = []
        for b, idxs in groups.items():
            order = rng.permutation(idxs) if shuffle else np.asarray(idxs)
            for start in range(0, len(order), batch_size):
                sel = order[start : start + batch_size]
                if len(sel) < batch_size:
                    fill = rng.choice(idxs, size=batch_size - len(sel))
                    sel = np.concatenate([sel, fill])
                epoch.append((b, sel))
        if shuffle:
            rng.shuffle(epoch)
        for b, sel in epoch:
            # skip = deterministic resume fast-forward (index-only)
            if skipped < skip:
                skipped += 1
                continue
            yield collate([trim(corpus[int(i)], b) for i in sel])


def make_grain_loader(
    corpus: VideoCorpus,
    batch_size: int,
    seed: int = 0,
    worker_count: int = 0,
    num_epochs: int | None = None,
):
    """grain-backed loader: the reference's DataLoader-worker parallelism.

    ``worker_count>0`` decodes examples (PNG frames, WAV) in that many
    subprocesses, overlapping host IO with device steps; ``num_epochs=None``
    repeats forever (epoch-based runs pass the real count and the loader
    stops when exhausted).
    """
    import grain.python as grain

    sampler = grain.IndexSampler(
        num_records=len(corpus),
        shuffle=True,
        seed=seed,
        shard_options=grain.NoSharding(),
        num_epochs=num_epochs,
    )
    return grain.DataLoader(
        data_source=corpus,
        sampler=sampler,
        operations=[grain.Batch(batch_size=batch_size, drop_remainder=True)],
        worker_count=worker_count,
    )
