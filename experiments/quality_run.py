"""Held-out learning-quality run: train the full trimodal model on a
learnable synthetic corpus and track DEV pick-accuracy + ROUGE against the
oracle ceiling and the random floor (VERDICT r3 item 1; SURVEY.md:88 train
contract, SURVEY.md §5 item 4).

Why a dedicated driver instead of `train.py --data_dir`: on the tunnelled
axon backend H2D runs at ~1 MB/s, so host-fed per-step batches make a
multi-thousand-step corpus run hours of pure transfer (CLAUDE.md). This
driver is the TPU-native shape of the same loop — it featurizes the whole
corpus ON DEVICE once (one upload), then samples training batches on
device by rng index gather, so steps run at device speed. The train/eval
steps themselves are the production ones (`train/loop.py`); nothing about
the optimization differs.

CLI (TPU, full-size model):
    python experiments/quality_run.py --out runs/quality \
        --videos 240 --dev 32 --steps 3000

CPU-sized variants back `tests/test_convergence.py` (default suite).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def featurize_corpus(corpus, cfg, vgg_spec, chunk: int = 8):
    """Run the device-side frontend over every corpus example once →
    stacked feature arrays resident on device (plus targets)."""
    import jax
    import jax.numpy as jnp

    from mmbidaf_tpu.data.frontend import apply_frontend, cast_vgg_weights, frontend_init
    from mmbidaf_tpu.data.pipeline import collate

    fe = frontend_init(jax.random.key(1), cfg, vgg_spec=vgg_spec)
    # fe is a jit ARGUMENT, never a closure constant: baked-in VGG16 weights
    # make a ~0.5 GB HLO upload the remote compile server rejects (HTTP 413).
    fe = jax.device_put(cast_vgg_weights(fe, cfg.model.compute_dtype))
    featurize = jax.jit(
        lambda fe, raw: apply_frontend(fe, raw, cfg, vgg_spec))
    out_chunks = []
    n = len(corpus)
    for a in range(0, n, chunk):
        idxs = list(range(a, min(a + chunk, n)))
        # pad the tail chunk to the static shape by repeating the last row
        pad = chunk - len(idxs)
        raw = collate([corpus[i] for i in idxs] + [corpus[idxs[-1]]] * pad)
        targets, target_mask = raw.pop("targets"), raw.pop("target_mask")
        feats = featurize(fe, raw)
        feats["targets"] = jnp.asarray(targets)
        feats["target_mask"] = jnp.asarray(target_mask)
        if pad:
            feats = jax.tree.map(lambda x: x[: len(idxs)], feats)
        out_chunks.append(feats)
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *out_chunks)


def make_batch_sampler(feats, batch: int):
    """Jitted on-device minibatch gather: seed → batch dict (no per-step
    H2D beyond one scalar)."""
    import jax

    n = jax.tree.leaves(feats)[0].shape[0]

    @jax.jit
    def sample(feats, key):
        idx = jax.random.randint(key, (batch,), 0, n)
        return jax.tree.map(lambda a: a[idx], feats)

    return sample


def pick_metrics(picks: np.ndarray, targets: np.ndarray,
                 target_mask: np.ndarray) -> dict[str, float]:
    """Set-overlap pick accuracy: |picks ∩ gold| / |gold| per video, plus
    exact-set match rate. Order-free — the summary is an ordered *set* of
    sentences (summary_from_picks sorts), so set recovery is the metric."""
    overlaps, exacts = [], []
    for b in range(picks.shape[0]):
        k = int(target_mask[b].sum())
        if k == 0:
            continue
        gold = set(int(t) for t in targets[b][:k])
        got = set(int(p) for p in picks[b])
        overlaps.append(len(gold & got) / len(gold))
        exacts.append(float(gold <= got))
    return {
        "pick_overlap": float(np.mean(overlaps)) if overlaps else 0.0,
        "pick_exact": float(np.mean(exacts)) if exacts else 0.0,
        "n": len(overlaps),
    }


def per_cue_recovery(picks: np.ndarray, cues_list) -> dict[str, float]:
    """Per-cue-class pick recovery on a split-cue corpus: of all key
    sentences whose ONLY cue is class c, what fraction landed in the
    model's picks? The tower-ablation metric (VERDICT r4 item 1): a
    text-only model can recover 'text' keys but has no signal for
    'image'/'audio' keys, so those rates measure whether the image/audio
    towers move held-out quality."""
    hit: dict[str, int] = {}
    tot: dict[str, int] = {}
    for b, cues in enumerate(cues_list):
        got = set(int(p) for p in picks[b])
        for k, c in cues.items():
            tot[c] = tot.get(c, 0) + 1
            hit[c] = hit.get(c, 0) + (1 if int(k) in got else 0)
    return {f"recovered_{c}": round(hit[c] / tot[c], 4) for c in sorted(tot)}


def eval_dev(eval_step, params, dev_feats, dev_meta, batch: int):
    """Chunked dev eval → pick metrics + ROUGE-1/2/L of the assembled
    summaries (host-side rouge_score, like the reference)."""
    import jax
    import jax.numpy as jnp

    from mmbidaf_tpu.train.metrics import batch_rouge

    n = jax.tree.leaves(dev_feats)[0].shape[0]
    picks_all, losses = [], []
    for a in range(0, n, batch):
        idx = np.arange(a, min(a + batch, n))
        pad = batch - len(idx)
        idx_p = np.concatenate([idx, np.repeat(idx[-1:], pad)])
        chunk = jax.tree.map(lambda x: x[jnp.asarray(idx_p)], dev_feats)
        out = eval_step(params, chunk)
        picks_all.append(np.asarray(out["picks"])[: len(idx)])
        losses.append(float(out["loss"]))
    picks = np.concatenate(picks_all, axis=0)
    m = pick_metrics(picks, np.asarray(dev_feats["targets"]),
                     np.asarray(dev_feats["target_mask"]))
    scores, n_scored = batch_rouge(picks, dev_meta["sentences"], dev_meta["golds"])
    m.update({k: round(v, 4) for k, v in scores.items()})
    if dev_meta.get("cues"):
        m.update(per_cue_recovery(picks, dev_meta["cues"]))
    m["eval_loss"] = float(np.mean(losses))
    return m, picks


def load_split(data_dir: str, cfg):
    """train/dev VideoCorpus pair + dev host metadata for ROUGE."""
    from mmbidaf_tpu.data.pipeline import VideoCorpus
    from mmbidaf_tpu.data.text import sent_tokenize
    from mmbidaf_tpu.data.vocab import vocab_from_corpus_dir

    train_dir = os.path.join(data_dir, "train")
    dev_dir = os.path.join(data_dir, "dev")
    if not os.path.isdir(train_dir):
        raise FileNotFoundError(f"{data_dir}: expected train/ + dev/ subdirs "
                                "(make_synthetic_corpus.py --split N)")
    w2i = vocab_from_corpus_dir(train_dir, max_size=cfg.data.vocab_size)
    train = VideoCorpus(train_dir, cfg, w2i)
    dev = VideoCorpus(dev_dir, cfg, w2i)
    sentences, golds, cues = [], [], []
    for vid in dev.video_ids:
        vd = os.path.join(dev_dir, vid)
        with open(os.path.join(vd, "transcript.txt")) as f:
            sentences.append(sent_tokenize(f.read())[: cfg.data.max_sentences])
        with open(os.path.join(vd, "summary.txt")) as f:
            golds.append(f.read())
        cpath = os.path.join(vd, "cues.json")
        if os.path.exists(cpath):
            with open(cpath) as f:
                cues.append({int(k): v for k, v in json.load(f)["cues"].items()
                             if int(k) < cfg.data.max_sentences})
    meta = {"sentences": sentences, "golds": golds}
    if len(cues) == len(sentences):  # per-cue metrics need every dev video
        meta["cues"] = cues
    return train, dev, meta


def run_quality(
    cfg,
    data_dir: str,
    steps: int,
    batch: int,
    eval_every: int,
    vgg_spec,
    seed: int = 0,
    out_path: str | None = None,
    log=print,
) -> dict:
    """Train → eval curve → final summary dict (the whole demo)."""
    import jax
    import jax.numpy as jnp

    from mmbidaf_tpu.data.synthetic import random_word_vectors
    from mmbidaf_tpu.models.mmbidaf import mmbidaf_init
    from mmbidaf_tpu.train.loop import init_train_state, make_eval_step, make_train_step
    from mmbidaf_tpu.train.metrics import batch_rouge

    train, dev, dev_meta = load_split(data_dir, cfg)
    t0 = time.perf_counter()
    train_feats = featurize_corpus(train, cfg, vgg_spec)
    dev_feats = featurize_corpus(dev, cfg, vgg_spec)
    log(f"featurized {len(train)} train + {len(dev)} dev videos in "
        f"{time.perf_counter() - t0:.1f}s")

    rng = np.random.default_rng(seed)
    wv = random_word_vectors(rng, cfg.data.vocab_size, cfg.model.emb_dim)
    params = mmbidaf_init(jax.random.key(seed), cfg, jnp.asarray(wv))
    state = init_train_state(jax.random.key(seed + 1), params, cfg)
    train_step = make_train_step(cfg)
    eval_step = make_eval_step(cfg)
    sample = make_batch_sampler(train_feats, batch)

    # Baselines: random floor = the untrained model at step 0 (measured, not
    # assumed); oracle ceiling = scoring the gold picks themselves.
    dev_targets = np.asarray(dev_feats["targets"])
    oracle_scores, _ = batch_rouge(dev_targets, dev_meta["sentences"],
                                   dev_meta["golds"])

    curve = []
    sink = open(out_path, "w") if out_path else None

    def record(step, m, losses):
        row = {"step": step, "train_loss": round(float(np.mean(losses)), 4)
               if losses else None, **{k: (round(v, 4) if isinstance(v, float)
                                           else v) for k, v in m.items()}}
        curve.append(row)
        if sink:
            sink.write(json.dumps(row) + "\n")
            sink.flush()
        cue = "".join(f" {k[10:]}={v:.2f}" for k, v in sorted(m.items())
                      if k.startswith("recovered_"))
        log(f"step {step}: train_loss={row['train_loss']} "
            f"pick_overlap={m['pick_overlap']:.3f} ROUGE-L={m['ROUGE-L']:.3f}"
            + cue)

    m0, _ = eval_dev(eval_step, state.params, dev_feats, dev_meta, batch)
    record(0, m0, [])

    losses = []
    t0 = time.perf_counter()
    for step in range(1, steps + 1):
        b = sample(train_feats, jax.random.fold_in(jax.random.key(seed + 2), step))
        state, metrics = train_step(state, b)
        losses.append(metrics["loss"])
        if step % eval_every == 0 or step == steps:
            # ONE stacked D2H per eval window (per-scalar fetches pay
            # seconds each through the relay — CLAUDE.md)
            losses = list(np.asarray(jnp.stack(losses)).astype(float))
            m, _ = eval_dev(eval_step, state.ema_params, dev_feats, dev_meta, batch)
            record(step, m, losses)
            losses = []
    train_s = time.perf_counter() - t0

    final = {
        "towers": ("text" + ("+image" if cfg.model.use_images else "")
                   + ("+audio" if cfg.model.use_audio else "")),
        "final": curve[-1],
        "floor": {k: curve[0][k] for k in
                  ("pick_overlap", "pick_exact", "ROUGE-1", "ROUGE-2", "ROUGE-L")},
        "oracle_ceiling": {k: round(v, 4) for k, v in oracle_scores.items()},
        "steps": steps,
        "batch": batch,
        "train_videos": len(train),
        "dev_videos": len(dev),
        "steps_per_s": round(steps / train_s, 2),
        "backend": jax.default_backend(),
    }
    if sink:
        sink.write(json.dumps(final) + "\n")
        sink.close()
    return final


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default=None,
                    help="existing train/dev corpus; omit to generate one")
    ap.add_argument("--out", default=None, help="JSONL curve path")
    ap.add_argument("--videos", type=int, default=240)
    ap.add_argument("--dev", type=int, default=32)
    ap.add_argument("--sentences", type=int, default=12)
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--eval_every", type=int, default=250)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--lr", type=float, default=0.5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tiny", action="store_true",
                    help="CPU-sized config (tiny VGG, small dims)")
    ap.add_argument("--no_images", action="store_true",
                    help="ablate the image tower (ModelConfig.use_images=False)")
    ap.add_argument("--no_audio", action="store_true",
                    help="ablate the audio tower (ModelConfig.use_audio=False)")
    ap.add_argument("--cue_mode", choices=("all", "split"), default="all",
                    help="generated-corpus cue assignment (split = one cue "
                         "per key sentence, for tower ablations)")
    a = ap.parse_args()

    from mmbidaf_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from mmbidaf_tpu.ops.vgg import TINY_SPEC, VGG16_SPEC

    data_dir = a.data_dir
    if data_dir is None:
        from examples.make_synthetic_corpus import make_corpus

        data_dir = f"/tmp/quality_corpus_{a.cue_mode}"
        if not os.path.isdir(os.path.join(data_dir, "train")):
            make_corpus(data_dir, videos=a.videos, sentences=a.sentences,
                        frames=a.frames, seed=a.seed, learnable=True,
                        split=a.dev, cue_mode=a.cue_mode)
            print(f"generated learnable corpus under {data_dir}")

    if a.tiny:
        data = DataConfig(max_sentences=a.sentences, max_words=12,
                          max_keyframes=a.frames, max_audio_frames=64,
                          vocab_size=512, image_size=32, n_fft=256,
                          win_length=256, hop_length=128)
        model = ModelConfig(hidden_size=32, img_feat_dim=64, audio_feat_dim=40,
                            max_decode_steps=3, vgg_variant="tiny")
        spec = TINY_SPEC
    else:
        data = DataConfig(max_sentences=a.sentences, max_words=16,
                          max_keyframes=a.frames, max_audio_frames=512,
                          vocab_size=2048, image_size=224)
        model = ModelConfig(hidden_size=a.hidden, img_feat_dim=4096,
                            audio_feat_dim=40, max_decode_steps=3,
                            compute_dtype="bfloat16",
                            use_pallas_attention=True, use_pallas_lstm=True)
        spec = VGG16_SPEC
    import dataclasses

    model = dataclasses.replace(model, use_images=not a.no_images,
                                use_audio=not a.no_audio)
    cfg = Config(model=model, data=data,
                 train=TrainConfig(batch_size=a.batch, lr=a.lr))

    out_path = a.out
    if out_path is None:
        # tracked-by-default (VERDICT r4 item 3): every curve a doc cites
        # must exist in git — docs/runs/ is committed, unlike runs/
        towers = ("text" + ("" if a.no_images else "+image")
                  + ("" if a.no_audio else "+audio"))
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        os.makedirs(os.path.join(repo, "docs", "runs"), exist_ok=True)
        out_path = os.path.join(
            repo, "docs", "runs",
            f"quality_{a.cue_mode}_{towers}.jsonl".replace("+", "-"))
        print(f"writing curve to {out_path}")

    final = run_quality(cfg, data_dir, a.steps, a.batch, a.eval_every,
                        spec, seed=a.seed, out_path=out_path)
    print(json.dumps(final))


if __name__ == "__main__":
    main()
