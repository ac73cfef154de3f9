"""Decompose the e2e batch time: frontend (resize/VGG/audio) vs model vs
decode, at the bench shapes (batch 32, 16 keyframes @224², 512 MFCC frames).

    python experiments/e2e_breakdown.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from experiments.conv_profile import slope_time  # noqa: E402


def main():
    from bench import build_bench_config, make_raw_batch_on_device
    from mmbidaf_tpu.data.frontend import apply_frontend, frontend_init
    from mmbidaf_tpu.data.synthetic import random_word_vectors
    from mmbidaf_tpu.models.mmbidaf import mmbidaf_decode, mmbidaf_init
    from mmbidaf_tpu.ops import audio as audio_ops
    from mmbidaf_tpu.ops.vgg import VGG16_SPEC, preprocess_frames, vgg_features

    import numpy as np

    cfg = build_bench_config(quick=False)
    B = int(os.environ.get("MMB_BENCH_B", "32"))
    d, m = cfg.data, cfg.model
    rng = np.random.default_rng(0)
    wv = random_word_vectors(rng, d.vocab_size, m.emb_dim)
    params = mmbidaf_init(jax.random.key(0), cfg, jnp.asarray(wv))
    fe = frontend_init(jax.random.key(1), cfg, vgg_spec=VGG16_SPEC)
    cdt = jnp.dtype(m.compute_dtype)
    fe_c = jax.tree.map(lambda x: x.astype(cdt) if x.dtype == jnp.float32 else x, fe)
    raw = make_raw_batch_on_device(cfg, B)
    print(json.dumps({"backend": jax.default_backend(), "batch": B}), flush=True)

    def report(tag, step, init, *args):
        s = slope_time(step, init, *args)
        print(json.dumps({"op": tag, "ms": round(s * 1e3, 2)}), flush=True)

    # full pipeline (frontend + model + greedy decode)
    @jax.jit
    def full(acc, params, fe, raw):
        r = dict(raw)
        r["waveform"] = raw["waveform"] + acc * 1e-12
        batch = apply_frontend(fe, r, cfg, VGG16_SPEC)
        _, picks = mmbidaf_decode(params, batch, cfg)
        return picks.sum().astype(jnp.float32) * 1e-6

    report("full_pipeline", full, jnp.float32(0.0), params, fe, raw)

    # frontend only
    @jax.jit
    def fr(acc, fe, raw):
        r = dict(raw)
        r["waveform"] = raw["waveform"] + acc * 1e-12
        batch = apply_frontend(fe, r, cfg, VGG16_SPEC)
        return batch["images"].sum().astype(jnp.float32) * 1e-9 + batch["audio"].mean()

    report("frontend", fr, jnp.float32(0.0), fe, raw)

    # resize+normalize only (512 frames)
    flat_frames = raw["frames"].reshape((-1,) + raw["frames"].shape[2:])

    @jax.jit
    def rz(acc, frames):
        x = preprocess_frames(frames + (acc.astype(jnp.int32) % 2).astype(jnp.uint8),
                              d.image_size)
        return x.mean().astype(jnp.float32)

    report("resize_normalize", rz, jnp.float32(0.0), flat_frames)

    # VGG only (on pre-resized images, bf16)
    @jax.jit
    def mk_imgs(seed):
        return jax.random.normal(jax.random.key(seed),
                                 (B * d.max_keyframes, d.image_size, d.image_size, 3), cdt)

    imgs = mk_imgs(0)
    vgg_p = fe_c["vgg"]

    @jax.jit
    def vg(acc, vgg_p, imgs):
        y = vgg_features(vgg_p, imgs + acc.astype(cdt), VGG16_SPEC)
        return y.mean().astype(jnp.float32)

    report("vgg_only", vg, jnp.float32(0.0), vgg_p, imgs)

    # audio frontend only
    @jax.jit
    def au(acc, consts, wavef):
        y = audio_ops.waveform_to_features(
            wavef + acc * 1e-12, consts, d.win_length, d.hop_length,
            d.max_audio_frames, feature="mfcc")
        return y.mean()

    report("audio_frontend", au, jnp.float32(0.0), fe["audio_consts"], raw["waveform"])

    # model + decode on features
    @jax.jit
    def mk_feats(seed):
        ks = jax.random.split(jax.random.key(seed), 2)
        return {
            "text_ids": raw["text_ids"], "word_mask": raw["word_mask"],
            "sent_mask": raw["sent_mask"], "img_mask": raw["img_mask"],
            "aud_mask": raw["aud_mask"],
            "images": jax.random.normal(ks[0], (B, d.max_keyframes, m.img_feat_dim), jnp.float32),
            "audio": jax.random.normal(ks[1], (B, d.max_audio_frames, m.audio_feat_dim), jnp.float32),
        }

    feats = mk_feats(0)

    @jax.jit
    def md(acc, params, feats):
        f = dict(feats)
        f["images"] = feats["images"] + acc * 1e-9
        _, picks = mmbidaf_decode(params, f, cfg)
        return picks.sum().astype(jnp.float32) * 1e-6

    report("model_decode_on_features", md, jnp.float32(0.0), params, feats)


if __name__ == "__main__":
    main()
