"""Benchmark CLI: end-to-end raw-video→summary throughput (BASELINE.md).

Measures videos/sec/chip for the batched trimodal pipeline (device-side VGG
+ MFCC frontend + model + greedy pointer decode) on the available
accelerator, and anchors it against a self-built PyTorch-CPU baseline
pipeline (the reference is pure-Python torch with no published numbers —
BASELINE.md; the torch oracle doubles as the baseline harness, SURVEY §8 R6).

Prints ONE JSON line:
  {"metric": "videos_per_sec_per_chip", "value": N, "unit": "videos/s",
   "vs_baseline": ratio, ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def enable_compilation_cache():
    """Repo-local persistent compilation cache: a local hit skips the
    ~10-min remote server compile, so the driver's end-of-round
    `python bench.py` reuses what the builder's final warm-up run
    populated, regardless of server-side cache eviction."""
    from mmbidaf_tpu.utils.cache import enable_compilation_cache as enable

    enable(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))


def build_bench_config(quick: bool, vgg_chunk: int = 0):
    from mmbidaf_tpu.config import Config, DataConfig, ModelConfig

    if quick:
        data = DataConfig(
            max_sentences=16, max_words=8, max_keyframes=4, max_audio_frames=64,
            vocab_size=5000, image_size=64, n_fft=256, win_length=200, hop_length=160,
        )
        model = ModelConfig(hidden_size=64, img_feat_dim=512, audio_feat_dim=40,
                            drop_prob=0.0, max_decode_steps=4,
                            vgg_frame_chunk=vgg_chunk)
    else:
        data = DataConfig(
            max_sentences=32, max_words=16, max_keyframes=16, max_audio_frames=512,
            vocab_size=20000, image_size=224,
        )
        # TPU-native serving config: bf16 compute (conv/LSTM/attention on the
        # bf16 MXU path) + fused Pallas attention + Pallas LSTM kernel
        # (neutral at batch 32, -27% single-video latency) + the one-pass
        # whole-example MFCC kernel (round 3: B=1 latency 6.6 -> 6.03 ms,
        # neutral at batch 32). The torch-CPU baseline stays fp32 — that's
        # what the reference runs.
        model = ModelConfig(hidden_size=128, img_feat_dim=4096, audio_feat_dim=40,
                            drop_prob=0.0, max_decode_steps=4,
                            compute_dtype="bfloat16", use_pallas_attention=True,
                            use_pallas_lstm=True, use_pallas_melspec=True,
                            vgg_frame_chunk=vgg_chunk)
    return Config(model=model, data=data)


def make_raw_batch(rng, cfg, B, frame_hw=(240, 320)):
    from mmbidaf_tpu.data.synthetic import synthetic_batch

    d = cfg.data
    base = synthetic_batch(rng, cfg, batch_size=B)
    n_samples = d.max_audio_frames * d.hop_length + d.win_length
    return {
        "text_ids": base["text_ids"],
        "word_mask": base["word_mask"],
        "sent_mask": base["sent_mask"],
        "img_mask": base["img_mask"],
        "aud_mask": base["aud_mask"],
        "frames": (rng.random((B, d.max_keyframes, *frame_hw, 3)) * 255).astype(np.uint8),
        "waveform": (rng.standard_normal((B, n_samples)) * 0.1).astype(np.float32),
    }


def make_raw_batch_on_device(cfg, B, frame_hw=(240, 320)):
    """Device-side synthetic raw batch (see bench_jax note on H2D cost)."""
    import jax
    import jax.numpy as jnp

    d, m = cfg.data, cfg.model
    n_samples = d.max_audio_frames * d.hop_length + d.win_length
    T_s, W, T_i, T_a = d.max_sentences, d.max_words, d.max_keyframes, d.max_audio_frames

    @jax.jit
    def gen(seed):
        # Keys derived inside jit (closure key constants would be fetched
        # host-side at lowering time — a needless D2H on this backend).
        ks = jax.random.split(jax.random.key(seed), 4)
        return {
            "text_ids": jax.random.randint(ks[0], (B, T_s, W), 2, d.vocab_size, jnp.int32),
            "word_mask": jnp.ones((B, T_s, W), jnp.float32),
            "sent_mask": jnp.ones((B, T_s), jnp.float32),
            "img_mask": jnp.ones((B, T_i), jnp.float32),
            "aud_mask": jnp.ones((B, T_a), jnp.float32),
            "frames": jax.random.randint(ks[1], (B, T_i, *frame_hw, 3), 0, 256, jnp.int32).astype(jnp.uint8),
            "waveform": jax.random.normal(ks[2], (B, n_samples), jnp.float32) * 0.1,
        }

    return {k: v for k, v in gen(jnp.int32(7)).items()}


def bench_jax(cfg, batch_size: int, iters: int, vgg_spec) -> dict:
    """Time the end-to-end pipeline with an ON-DEVICE iteration loop.

    On this tunnelled TPU backend ``block_until_ready`` is effectively a
    no-op and every host fetch pays seconds of relay latency, so per-call
    wall-clock timing is meaningless. Instead: run the whole pipeline N
    times inside one jitted ``lax.fori_loop`` whose carry perturbs the next
    iteration's inputs (defeating loop-invariant hoisting), fetch one scalar,
    and take the SLOPE between two iteration counts — constant dispatch +
    fetch + relay overheads cancel.
    """
    import jax
    import jax.numpy as jnp

    from mmbidaf_tpu.data.frontend import apply_frontend
    from mmbidaf_tpu.data.synthetic import random_word_vectors
    from mmbidaf_tpu.models.mmbidaf import mmbidaf_decode, mmbidaf_init

    rng = np.random.default_rng(0)
    wv = random_word_vectors(rng, cfg.data.vocab_size, cfg.model.emb_dim)
    params = mmbidaf_init(jax.random.key(0), cfg, jnp.asarray(wv))
    from mmbidaf_tpu.data.frontend import frontend_init

    fe = frontend_init(jax.random.key(1), cfg, vgg_spec=vgg_spec)
    from mmbidaf_tpu.data.frontend import cast_vgg_weights

    fe = cast_vgg_weights(fe, cfg.model.compute_dtype)
    # Synthetic raw batch generated ON DEVICE: host-side generation + H2D of
    # ~100 MB of frames through this tunnelled backend costs minutes of wall
    # clock and is not part of the measured pipeline (the slope timing below
    # excludes one-time transfers anyway).
    # First device computation pays the relay claim/handshake (measured
    # 150-220 s in a fresh process, independent of program size); flush it
    # on a trivial op so `compile_s` reports compilation, not the claim.
    t0 = time.perf_counter()
    jax.device_get(jnp.zeros((), jnp.float32) + 1.0)
    claim_s = time.perf_counter() - t0

    raw = make_raw_batch_on_device(cfg, batch_size)

    def step_fn(params, fe, raw, acc):
        # The acc→waveform dependency chains the dispatches (each call's
        # input depends on the previous call's output, so executions
        # serialize and per-call wall-clock is real work). The frames stay
        # a plain program parameter: separate dispatches of a jitted
        # program re-execute it in full regardless (there is no cross-call
        # CSE to defeat), and perturbing the 118 MB uint8 tensor per step
        # cost a measured ~0.9 ms of add+layout-copy that is bench-harness
        # artifact, not pipeline work.
        r = dict(raw)
        r["waveform"] = raw["waveform"] + acc * 1e-12
        batch = apply_frontend(fe, r, cfg, vgg_spec)
        _, picks = mmbidaf_decode(params, batch, cfg)
        return picks.sum().astype(jnp.float32) * 1e-6

    # NOTE (round-3 negative result): AUTO input layouts
    # (jax.experimental.layout Format(Layout.AUTO) + device_put into
    # compiled.input_formats) are NOT usable on this backend — device_put
    # does not actually re-lay-out committed on-device arrays here, so the
    # call either coincidentally matches the default layouts (measured: no
    # benefit, 288.1 vs 289.2 plain jit) or rejects the arguments with a
    # layout mismatch; at B=1 the AUTO path hangs at execution. Plain jit
    # stands; the frames' ~0.5 ms in-program layout copy is accepted as
    # part of the measured pipeline.
    acc0 = jnp.float32(0.0)
    step = jax.jit(step_fn)
    t0 = time.perf_counter()
    jax.device_get(step(params, fe, raw, acc0))
    compile_s = time.perf_counter() - t0

    def run(m):
        t0 = time.perf_counter()
        acc = acc0
        for _ in range(m):
            acc = step(params, fe, raw, acc)
        jax.device_get(acc)
        return time.perf_counter() - t0

    n_lo, n_hi = 2, 2 + max(iters, 3)
    run(1)  # warmup dispatch path
    t_lo = min(run(n_lo), run(n_lo))
    t_hi = min(run(n_hi), run(n_hi))
    per_batch = (t_hi - t_lo) / (n_hi - n_lo)
    # Tiny programs (--quick) can measure a slope below the relay's noise
    # floor; retry with a longer chain rather than reporting absurd rates.
    if per_batch < 1e-4:
        n_lo, n_hi = 4, 4 + 4 * max(iters, 3)
        t_lo = min(run(n_lo), run(n_lo))
        t_hi = min(run(n_hi), run(n_hi))
        per_batch = (t_hi - t_lo) / (n_hi - n_lo)
    per_batch = max(per_batch, 1e-6)

    n_chips = jax.device_count()
    # Analytic-FLOP MFU: hardware-relative perf, independent of the noisy
    # torch-CPU baseline denominator (utils/flops.py; VERDICT r3 item 3).
    from mmbidaf_tpu.utils.flops import e2e_decode_flops_per_video, peak_bf16_tflops

    flops_per_video = e2e_decode_flops_per_video(cfg, vgg_spec)
    achieved_tflops = flops_per_video * batch_size / per_batch / 1e12 / n_chips
    peak = peak_bf16_tflops(jax.devices()[0].device_kind)
    return {
        "videos_per_sec_per_chip": batch_size / per_batch / n_chips,
        "achieved_tflops": achieved_tflops,
        "mfu": achieved_tflops / peak if peak else None,
        "peak_bf16_tflops": peak,
        "flops_per_video": flops_per_video,
        # One batch = one program: all `batch_size` videos finish together
        # after `per_batch` seconds, so batch latency IS each video's p50
        # completion latency; amortized time-per-video is a separate number.
        "p50_batch_latency_s": per_batch,
        "amortized_s_per_video": per_batch / batch_size,
        "compile_s": compile_s,
        "claim_s": claim_s,
        "fixed_overhead_s": max(t_lo - per_batch, 0.0),
        "n_chips": n_chips,
        "backend": jax.default_backend(),
    }


def bench_torch_baseline(cfg, videos: int, vgg_spec, frame_hw=(240, 320)) -> dict:
    """Reference-style PyTorch-CPU pipeline, batch 1 per video (SURVEY §7)."""
    import torch

    sys.path.insert(0, ".")
    from tests.oracles import torch_model as oracle
    from tests.test_vgg import _torch_vgg
    from mmbidaf_tpu.ops import audio as audio_ops

    d, m = cfg.data, cfg.model
    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    wv = torch.randn(d.vocab_size, m.emb_dim) * 0.4
    model = oracle.MMBiDAF(
        wv, m.hidden_size, img_feat_dim=m.img_feat_dim, audio_feat_dim=m.audio_feat_dim,
        num_decode_steps=m.max_decode_steps,
    ).eval()
    tvgg = _torch_vgg(vgg_spec, d.image_size, m.img_feat_dim)
    consts = {
        k: np.asarray(v) for k, v in audio_ops.make_audio_frontend_consts(
            d.sample_rate, d.n_fft, d.win_length, d.n_mels, d.n_mfcc).items()
    }
    frame_idx = (np.arange(d.max_audio_frames)[:, None] * d.hop_length
                 + np.arange(d.win_length)[None, :])

    # +1 warmup video: the first forward pays torch lazy-init / thread-pool
    # spin-up and is discarded (baseline variance was ~5× without this).
    videos = videos + 1
    raw = make_raw_batch(rng, cfg, videos, frame_hw)
    times = []
    with torch.no_grad():
        for v in range(videos):
            t0 = time.perf_counter()
            # image path: resize (interpolate) + VGG
            fr = torch.from_numpy(raw["frames"][v].transpose(0, 3, 1, 2)).float() / 255.0
            fr = torch.nn.functional.interpolate(
                fr, size=(d.image_size, d.image_size), mode="bilinear", align_corners=False
            )
            img_feats = tvgg(fr).unsqueeze(0)
            # audio path: numpy framing + windowed DFT MFCC (librosa stand-in)
            frames_a = raw["waveform"][v : v + 1][:, frame_idx]
            spec = (frames_a @ consts["cos"]) ** 2 + (frames_a @ consts["sin"]) ** 2
            mel = spec @ consts["mel_fb"]
            logspec = 10 * np.log10(np.maximum(mel, 1e-10))
            mfcc = np.maximum(logspec - logspec.max(), -80.0) @ consts["dct"]
            aud = torch.from_numpy(mfcc.astype(np.float32))
            # model forward + greedy decode
            model(
                text_ids=torch.from_numpy(raw["text_ids"][v : v + 1]).long(),
                word_mask=torch.from_numpy(raw["word_mask"][v : v + 1]),
                sent_mask=torch.from_numpy(raw["sent_mask"][v : v + 1]),
                images=img_feats,
                img_mask=torch.from_numpy(raw["img_mask"][v : v + 1]),
                audio=aud,
                aud_mask=torch.from_numpy(raw["aud_mask"][v : v + 1]),
            )
            times.append(time.perf_counter() - t0)
    t = np.asarray(times[1:])  # drop the warmup video
    per_video = float(np.median(t))
    # Run-to-run baseline drift is ~±20% (BASELINE.md); report the spread so
    # the headline ratio carries its real uncertainty, not 4 significant
    # digits off a noisy denominator.
    return {
        "videos_per_sec": 1.0 / per_video,
        "p50_per_video_latency_s": per_video,
        "videos_per_sec_range": [1.0 / float(t.max()), 1.0 / float(t.min())],
        "n_videos": len(t),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small shapes (CI smoke)")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--baseline-videos", type=int, default=5)
    ap.add_argument("--skip-baseline", action="store_true")
    ap.add_argument(
        "--vgg-chunk", type=int, default=0,
        help="resize+VGG frame-chunk size (ModelConfig.vgg_frame_chunk); "
        "0 = auto (single pass unless the activation footprint exceeds "
        "the HBM budget — B >= 128 then runs chunked instead of OOMing)",
    )
    args = ap.parse_args()

    from mmbidaf_tpu.ops.vgg import TINY_SPEC, VGG16_SPEC

    # Default serving batch 64 (round-3 A/B on the chip): per-batch fixed
    # work (resize setup, model towers, decode, dispatch) amortizes over
    # more videos — 304.3 v/s at B=64 vs 287.7 at B=32, +5.8%. B=128 was
    # measured at 302.9 (slight loss): it needs frame-chunked VGG to fit
    # HBM (auto, see ModelConfig.vgg_frame_chunk) and the chunk loop's
    # serialization cancels the amortization; its word-level LSTM rows run
    # the Pallas kernel row-chunked.
    batch = args.batch or (8 if args.quick else 64)
    vgg_chunk = args.vgg_chunk
    cfg = build_bench_config(args.quick, vgg_chunk)
    vgg_spec = TINY_SPEC if args.quick else VGG16_SPEC

    enable_compilation_cache()
    jax_res = bench_jax(cfg, batch, args.iters, vgg_spec)

    if args.skip_baseline:
        baseline_vps = base_range = None
    else:
        base_res = bench_torch_baseline(cfg, args.baseline_videos, vgg_spec)
        baseline_vps = base_res["videos_per_sec"]
        base_range = base_res["videos_per_sec_range"]

    vps = jax_res["videos_per_sec_per_chip"]
    result = {
        "metric": "videos_per_sec_per_chip",
        "value": round(vps, 3),
        "unit": "videos/s",
        "vs_baseline": round(vps / baseline_vps, 1) if baseline_vps else None,
        # the honest uncertainty band: ratio against the fastest/slowest
        # measured baseline video (baseline drift dominates; see BASELINE.md)
        "vs_baseline_range": (
            [round(vps / base_range[1], 1), round(vps / base_range[0], 1)]
            if base_range
            else None
        ),
        "p50_batch_latency_s": round(jax_res["p50_batch_latency_s"], 4),
        "amortized_s_per_video": round(jax_res["amortized_s_per_video"], 5),
        # achieved dense TFLOP/s per chip (analytic convs+GEMMs count,
        # utils/flops.py) and the fraction of the chip's bf16 MXU peak.
        "achieved_tflops": round(jax_res["achieved_tflops"], 1),
        "mfu": round(jax_res["mfu"], 3) if jax_res["mfu"] is not None else None,
        "peak_bf16_tflops": jax_res["peak_bf16_tflops"],
        "analytic_gflops_per_video": round(jax_res["flops_per_video"] / 1e9, 1),
        "baseline_videos_per_sec_cpu": round(baseline_vps, 3) if baseline_vps else None,
        "baseline_videos": None if args.skip_baseline else base_res["n_videos"],
        "batch_size": batch,
        "vgg_frame_chunk": vgg_chunk,
        "backend": jax_res["backend"],
        "n_chips": jax_res["n_chips"],
        "compile_s": round(jax_res["compile_s"], 1),
        "claim_s": round(jax_res["claim_s"], 1),
    }
    print(json.dumps(result))


def _install_sigterm():
    """SIGTERM → KeyboardInterrupt: an interrupted bench must UNWIND (so
    the PJRT client releases its device claim) rather than die abruptly —
    a killed TPU holder wedges the relay claim for ~5–15 min (CLAUDE.md).
    A driver/timeout that SIGTERMs a long bench now gets a clean exit."""
    import signal

    def _h(signum, frame):
        raise KeyboardInterrupt

    signal.signal(signal.SIGTERM, _h)


if __name__ == "__main__":
    _install_sigterm()
    try:
        main()
    except KeyboardInterrupt:
        print("bench interrupted; exiting cleanly", file=sys.stderr)
        raise SystemExit(130)
