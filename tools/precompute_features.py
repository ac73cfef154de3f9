"""Precompute per-video model features (the reference's artifact flow).

The reference preprocesses each video ONCE — VGG fc features + MFCC
frames saved as .npy artifacts — and trains from those (SURVEY §4.1).
Our device-side frontend makes that optional, but recomputing VGG every
epoch is ~30x the model's own training FLOPs; this CLI runs the jitted
frontend over a corpus once and writes ``features.npz`` per video:

    images [T_img, img_feat_dim]   (VGG fc2 features)
    audio  [T_aud, n_mfcc]         (MFCC frames)

``VideoCorpus`` auto-detects features.npz and serves feature batches;
the train step skips the frontend for them (its batch schema is keyed on
frames/waveform presence).

    python tools/precompute_features.py --data_dir /data/corpus \\
        --config_json runs/mmbidaf/config.json [--vgg vgg16] [--batch 8]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--config_json", default=None)
    ap.add_argument("--vgg", default="vgg16",
                    choices=["vgg16", "vgg19", "tiny"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seed", type=int, default=224)
    ap.add_argument("--force", action="store_true", help="overwrite existing")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mmbidaf_tpu.config import Config, config_from_json
    from mmbidaf_tpu.data.frontend import apply_frontend, frontend_init
    from mmbidaf_tpu.data.pipeline import VideoCorpus, collate
    from mmbidaf_tpu.data.vocab import vocab_from_corpus_dir
    from mmbidaf_tpu.ops.vgg import spec_for_variant

    cfg = config_from_json(args.config_json) if args.config_json else Config()
    vgg_spec = spec_for_variant(args.vgg)

    roots = [args.data_dir]
    if os.path.isdir(os.path.join(args.data_dir, "train")):
        roots = [os.path.join(args.data_dir, s) for s in ("train", "dev", "test")
                 if os.path.isdir(os.path.join(args.data_dir, s))]

    fe = frontend_init(jax.random.key(args.seed + 2), cfg, vgg_spec=vgg_spec)
    featurize = jax.jit(lambda r: apply_frontend(fe, r, cfg, vgg_spec))

    w2i = vocab_from_corpus_dir(roots[0])
    done = 0
    for root in roots:
        corpus = VideoCorpus(root, cfg, w2i, use_precomputed=False)
        todo = [
            i for i, vid in enumerate(corpus.video_ids)
            if args.force
            or not os.path.exists(os.path.join(root, vid, "features.npz"))
        ]
        for start in range(0, len(todo), args.batch):
            idxs = todo[start:start + args.batch]
            raw = {k: jnp.asarray(v)
                   for k, v in collate([corpus[i] for i in idxs]).items()}
            feat = featurize(raw)
            images = np.asarray(feat["images"])
            audio = np.asarray(feat["audio"])
            for j, i in enumerate(idxs):
                vid = corpus.video_ids[i]
                np.savez(
                    os.path.join(root, vid, "features.npz"),
                    images=images[j], audio=audio[j],
                    img_mask=np.asarray(raw["img_mask"][j]),
                    aud_mask=np.asarray(raw["aud_mask"][j]),
                )
                done += 1
            print(f"{root}: {min(start + args.batch, len(todo))}/{len(todo)}",
                  flush=True)
    print(f"wrote features.npz for {done} videos")


if __name__ == "__main__":
    main()
