"""A/B: bucket-ladder serving vs full-cap padding on the bench config.

Round-3+ bucket-ladder serving (``Summarizer(serve_buckets=…)``) trims a
request batch's feature axes to the smallest rung covering its true mask
lengths. The pipeline is VGG-dominated and VGG cost is ∝ keyframes, so a
batch of quarter-length videos should decode ~4× faster than the same
batch padded to the config caps — this measures that instead of assuming
it, at the exact bench serving shapes.

Both arms run the bit-identical step code on one TPU claim, timed with
bench.py's chained-dispatch slope method. The FULL arm is the same HLO as
``python bench.py`` (warm cache); the trimmed arm compiles the rung-shape
program once (then persists in the cache).

    python experiments/bucket_ab.py [--batch 64] [--frac 0.25] [--quick]

Prints one JSON line: videos/s per arm + the trimmed/full speedup.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import (  # noqa: E402
    build_bench_config,
    enable_compilation_cache,
    make_raw_batch_on_device,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--frac", type=float, default=0.25,
                    help="true length per axis as a fraction of the cap")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--quick", action="store_true", help="small shapes (CPU smoke)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mmbidaf_tpu.data.frontend import (
        apply_frontend,
        cast_vgg_weights,
        frontend_init,
    )
    from mmbidaf_tpu.data.pipeline import bucket_for
    from mmbidaf_tpu.data.synthetic import random_word_vectors
    from mmbidaf_tpu.models.mmbidaf import mmbidaf_decode, mmbidaf_init
    from mmbidaf_tpu.ops.vgg import TINY_SPEC, VGG16_SPEC
    from mmbidaf_tpu.serving import serving_bucket_ladders

    cfg = build_bench_config(args.quick)
    vgg_spec = TINY_SPEC if args.quick else VGG16_SPEC
    d = cfg.data

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    wv = random_word_vectors(rng, cfg.data.vocab_size, cfg.model.emb_dim)
    params = mmbidaf_init(jax.random.key(0), cfg, jnp.asarray(wv))
    fe = frontend_init(jax.random.key(1), cfg, vgg_spec=vgg_spec)
    fe = cast_vgg_weights(fe, cfg.model.compute_dtype)

    t0 = time.perf_counter()
    jax.device_get(jnp.zeros((), jnp.float32) + 1.0)  # flush the relay claim
    claim_s = time.perf_counter() - t0

    raw = make_raw_batch_on_device(cfg, args.batch)
    # Ragged truth: every video uses only `frac` of each axis. Masks become
    # prefix masks at the true lengths (device-side edit — no H2D).
    true = {
        "sentences": max(int(d.max_sentences * args.frac), 1),
        "words": max(int(d.max_words * args.frac), 1),
        "keyframes": max(int(d.max_keyframes * args.frac), 1),
        "audio_frames": max(int(d.max_audio_frames * args.frac), 1),
    }
    raw["sent_mask"] = (jnp.arange(d.max_sentences) < true["sentences"])[
        None, :
    ].astype(jnp.float32) * raw["sent_mask"]
    raw["word_mask"] = (jnp.arange(d.max_words) < true["words"])[
        None, None, :
    ].astype(jnp.float32) * raw["sent_mask"][:, :, None]
    raw["img_mask"] = (jnp.arange(d.max_keyframes) < true["keyframes"])[
        None, :
    ].astype(jnp.float32) * raw["img_mask"]
    raw["aud_mask"] = (jnp.arange(d.max_audio_frames) < true["audio_frames"])[
        None, :
    ].astype(jnp.float32) * raw["aud_mask"]

    # The trimmed arm: the same slicing serving.trim_raw_batch performs on
    # the host, done once on the device arrays (rungs are host ints).
    ladders = serving_bucket_ladders(cfg, True)
    bs = bucket_for(true["sentences"], ladders["sentences"])
    bw = bucket_for(true["words"], ladders["words"])
    bi = bucket_for(true["keyframes"], ladders["keyframes"])
    ba = bucket_for(true["audio_frames"], ladders["audio_frames"])
    trimmed = dict(raw)
    trimmed["text_ids"] = raw["text_ids"][:, :bs, :bw]
    trimmed["word_mask"] = raw["word_mask"][:, :bs, :bw]
    trimmed["sent_mask"] = raw["sent_mask"][:, :bs]
    trimmed["frames"] = raw["frames"][:, :bi]
    trimmed["img_mask"] = raw["img_mask"][:, :bi]
    trimmed["waveform"] = raw["waveform"][:, : ba * d.hop_length + d.win_length]
    trimmed["aud_mask"] = raw["aud_mask"][:, :ba]
    trimmed = {k: jax.device_put(v) for k, v in trimmed.items()}

    acc0 = jnp.float32(0.0)

    @jax.jit
    def step_fn(params, fe, raw, acc):
        # EXACTLY bench.py::step_fn — the full-cap arm is a warm cache hit
        r = dict(raw)
        r["waveform"] = raw["waveform"] + acc * 1e-12
        batch = apply_frontend(fe, r, cfg, vgg_spec)
        _, picks = mmbidaf_decode(params, batch, cfg)
        return picks.sum().astype(jnp.float32) * 1e-6

    @jax.jit
    def picks_fn(params, fe, raw):
        batch = apply_frontend(fe, raw, cfg, vgg_spec)
        _, picks = mmbidaf_decode(params, batch, cfg)
        return picks

    def slope(inputs, iters):
        def run(m):
            t0 = time.perf_counter()
            acc = acc0
            for _ in range(m):
                acc = step_fn(params, fe, inputs, acc)
            jax.device_get(acc)
            return time.perf_counter() - t0

        n_lo, n_hi = 2, 2 + max(iters, 3)
        run(1)
        t_lo = min(run(n_lo), run(n_lo))
        t_hi = min(run(n_hi), run(n_hi))
        per_batch = (t_hi - t_lo) / (n_hi - n_lo)
        if per_batch < 1e-4:  # --quick can dip below the relay noise floor
            n_lo, n_hi = 4, 4 + 4 * max(iters, 3)
            t_lo = min(run(n_lo), run(n_lo))
            t_hi = min(run(n_hi), run(n_hi))
            per_batch = (t_hi - t_lo) / (n_hi - n_lo)
        return max(per_batch, 1e-6)

    arms = {}
    per_batch_raw = {}  # unrounded — the speedup ratio must not divide 0.0000
    for name, inputs in (("full", raw), ("bucketed", trimmed)):
        t0 = time.perf_counter()
        jax.device_get(step_fn(params, fe, inputs, acc0))
        compile_s = time.perf_counter() - t0
        per_batch = slope(inputs, args.iters)
        per_batch_raw[name] = per_batch
        arms[name] = {
            "videos_per_sec_per_chip": round(args.batch / per_batch, 1),
            "p50_batch_latency_s": round(per_batch, 4),
            "compile_s": round(compile_s, 1),
        }

    # semantics check: identical picks (bf16 near-ties may flip a pick on
    # untrained random params; report, don't assert — the CPU parity tests
    # own correctness)
    p_full = np.asarray(jax.device_get(picks_fn(params, fe, raw)))
    p_trim = np.asarray(jax.device_get(picks_fn(params, fe, trimmed)))
    out = {
        "experiment": "bucket_ab",
        "batch_size": args.batch,
        "true_frac": args.frac,
        "rungs": {"sentences": bs, "words": bw, "keyframes": bi,
                  "audio_frames": ba},
        "backend": jax.default_backend(),
        "claim_s": round(claim_s, 1),
        **{f"{k}_{m}": v for m, a in arms.items() for k, v in a.items()},
        "bucketed_speedup": round(
            per_batch_raw["full"] / per_batch_raw["bucketed"], 2
        ),
        "picks_mismatched": int((p_full != p_trim).sum()),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    from bench import _install_sigterm  # SIGTERM unwinds cleanly; see bench.py

    _install_sigterm()
    try:
        main()
    except KeyboardInterrupt:
        print("interrupted; exiting cleanly", file=sys.stderr)
        raise SystemExit(130)
