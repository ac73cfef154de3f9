"""Per-modality tower ablation (VERDICT r4 item 1): prove the image and
audio towers move held-out quality, not just wire up.

Trains four configs — text-only, text+image, text+audio, trimodal — on the
SAME split-cue corpus (``make_synthetic_corpus.py --cue_mode split``: each
key sentence is identifiable by exactly ONE cue class, so a text-only
model has a sub-1.0 achievable ceiling BY CONSTRUCTION) and reports
per-cue-class held-out pick recovery per config. The trimodal contract
(SURVEY.md:57-64, configs 2-4 at SURVEY.md:91-95) predicts:

  * text-only      recovers text-cued keys, is blind to image/audio keys
  * text+image     additionally recovers image-cued keys
  * text+audio     additionally recovers audio-cued keys
  * trimodal       recovers all three classes

All four runs share one process = one TPU claim (CLAUDE.md); curves land
in the tracked ``docs/runs/`` directory (VERDICT r4 item 3).

    python experiments/ablation_sweep.py --steps 2000            # TPU
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python experiments/ablation_sweep.py --tiny --steps 500  # CPU twin
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TOWER_CONFIGS = {
    "text": dict(use_images=False, use_audio=False),
    "text+image": dict(use_images=True, use_audio=False),
    "text+audio": dict(use_images=False, use_audio=True),
    "trimodal": dict(use_images=True, use_audio=True),
}


def build_cfg(a):
    from mmbidaf_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from mmbidaf_tpu.ops.vgg import TINY_SPEC, VGG16_SPEC

    # logmel audio features: raw MFCC c0 reaches ~600 and saturates the
    # audio BiLSTM's gates — the probe runs only learned the audio cue
    # after switching (DataConfig.audio_features docstring)
    if a.tiny:
        data = DataConfig(max_sentences=a.sentences, max_words=12,
                          max_keyframes=a.frames, max_audio_frames=32,
                          vocab_size=512, image_size=32, n_fft=256,
                          win_length=256, hop_length=128,
                          audio_features="logmel")
        model = ModelConfig(hidden_size=24, img_feat_dim=48, audio_feat_dim=64,
                            max_decode_steps=3, vgg_variant="tiny")
        spec = TINY_SPEC
    else:
        data = DataConfig(max_sentences=a.sentences, max_words=16,
                          max_keyframes=a.frames, max_audio_frames=512,
                          vocab_size=2048, image_size=224,
                          audio_features="logmel")
        model = ModelConfig(hidden_size=a.hidden, img_feat_dim=4096,
                            audio_feat_dim=64, max_decode_steps=3,
                            compute_dtype="bfloat16",
                            use_pallas_attention=True, use_pallas_lstm=True)
        spec = VGG16_SPEC
    return Config(model=model, data=data,
                  train=TrainConfig(batch_size=a.batch, lr=a.lr)), spec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default=None,
                    help="existing split-cue train/dev corpus; omit to generate")
    ap.add_argument("--out", default=None,
                    help="summary JSON path (default docs/runs/ablation_<tag>.json)")
    ap.add_argument("--towers", default=",".join(TOWER_CONFIGS),
                    help="comma list from text,text+image,text+audio,trimodal")
    ap.add_argument("--videos", type=int, default=240)
    ap.add_argument("--dev", type=int, default=32)
    ap.add_argument("--sentences", type=int, default=12)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--keys", type=int, default=3)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--eval_every", type=int, default=250)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--lr", type=float, default=0.5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tiny", action="store_true")
    a = ap.parse_args()

    from experiments.quality_run import run_quality

    data_dir = a.data_dir
    if data_dir is None:
        from examples.make_synthetic_corpus import make_corpus
        from mmbidaf_tpu.serving import num_audio_samples

        # audio duration MUST match the featurized window exactly, or the
        # tail sentences' audio cues are cropped away (loader truncates)
        cfg0, _ = build_cfg(a)
        seconds = num_audio_samples(cfg0) / cfg0.data.sample_rate
        data_dir = f"/tmp/ablation_corpus_v{a.videos}s{a.seed}" + (
            "_tiny" if a.tiny else "")
        if not os.path.isdir(os.path.join(data_dir, "train")):
            make_corpus(data_dir, videos=a.videos, sentences=a.sentences,
                        frames=a.frames, seconds=seconds, seed=a.seed,
                        n_key=a.keys, learnable=True, split=a.dev,
                        cue_mode="split")
            print(f"generated split-cue corpus under {data_dir} "
                  f"({seconds:.2f}s audio)", flush=True)

    tag = "tiny" if a.tiny else "r5"
    run_dir = os.path.join(REPO, "docs", "runs")
    os.makedirs(run_dir, exist_ok=True)

    results = {}
    for name in a.towers.split(","):
        cfg, spec = build_cfg(a)
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, **TOWER_CONFIGS[name]))
        curve_path = os.path.join(
            run_dir, f"ablation_{tag}_{name.replace('+', '-')}.jsonl")
        print(f"=== {name} -> {curve_path}", flush=True)
        final = run_quality(cfg, data_dir, a.steps, a.batch, a.eval_every,
                            spec, seed=a.seed, out_path=curve_path,
                            log=lambda *x, **k: print(*x, flush=True, **k))
        results[name] = final
        print(json.dumps({name: final["final"]}), flush=True)

    out = a.out or os.path.join(run_dir, f"ablation_{tag}.json")
    table = {
        name: {k: r["final"].get(k) for k in
               ("pick_overlap", "pick_exact", "ROUGE-L", "recovered_text",
                "recovered_image", "recovered_audio")}
        for name, r in results.items()
    }
    summary = {
        "corpus": {"videos": a.videos, "dev": a.dev, "sentences": a.sentences,
                   "frames": a.frames, "keys": a.keys, "cue_mode": "split",
                   "seed": a.seed},
        "steps": a.steps, "batch": a.batch, "tiny": a.tiny,
        "table": table, "runs": results,
    }
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"wrote {out}")
    print(json.dumps(table, indent=1))


if __name__ == "__main__":
    main()
