"""Training-throughput benchmark (secondary; the driver runs bench.py).

Measures jitted train-step throughput (steps/s and videos/s) on feature
batches with the chained-dispatch slope method (see bench.py for why
wall-clock-per-call timing is invalid on this backend).

    python bench_train.py [--quick] [--steps 8]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--pallas", action="store_true",
                    help="fused Pallas attention-backward + LSTM-BPTT kernels "
                         "(supports dropout: similarity-only cd/qd operands)")
    ap.add_argument("--drop", type=float, default=0.2,
                    help="dropout prob (reference default 0.2; both paths)")
    ap.add_argument("--tree_opt", action="store_true",
                    help="per-leaf optimizer tree_maps instead of the default "
                         "flat raveled update (A/B for TrainConfig.flat_updates)")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize the encoder towers in backprop "
                         "(A/B for TrainConfig.remat_towers: recompute FLOPs "
                         "vs activation-HBM traffic)")
    ap.add_argument("--bf16", action="store_true",
                    help="mixed-precision training: towers/attention on the "
                         "bf16 MXU path, params/optimizer/loss in f32 (the "
                         "serving config's compute dtype)")
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import build_bench_config
    from mmbidaf_tpu.data.synthetic import random_word_vectors, synthetic_batch
    from mmbidaf_tpu.models.mmbidaf import mmbidaf_init
    from mmbidaf_tpu.train.loop import init_train_state, make_train_step

    cfg = build_bench_config(a.quick)
    # Default: fp32 + jnp kernels (the reference-style autodiff path).
    # --pallas dispatches the custom-VJP fused kernels; same drop_prob both
    # ways (the dropout variant feeds similarity-only cd/qd operands).
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, compute_dtype="bfloat16" if a.bf16 else "float32",
            use_pallas_attention=a.pallas,
            use_pallas_lstm=a.pallas,
            drop_prob=a.drop,
        ),
        train=dataclasses.replace(cfg.train, optimizer="adadelta",
                                  flat_updates=not a.tree_opt,
                                  remat_towers=a.remat),
    )
    B = a.batch or (8 if a.quick else 32)

    rng = np.random.default_rng(0)
    wv = random_word_vectors(rng, cfg.data.vocab_size, cfg.model.emb_dim)
    params = mmbidaf_init(jax.random.key(0), cfg, jnp.asarray(wv))
    state = init_train_state(jax.random.key(1), params, cfg)
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(rng, cfg, batch_size=B).items()}
    train_step = make_train_step(cfg)

    t0 = time.perf_counter()
    state, metrics = train_step(state, batch)
    jax.device_get(metrics["loss"])
    compile_s = time.perf_counter() - t0

    def run(m):
        nonlocal state
        t0 = time.perf_counter()
        last = None
        for _ in range(m):
            state, metrics = train_step(state, batch)
            last = metrics["loss"]
        jax.device_get(last)
        return time.perf_counter() - t0

    run(1)
    n_lo, n_hi = 2, 2 + max(a.steps, 3)
    t_lo = min(run(n_lo), run(n_lo))
    t_hi = min(run(n_hi), run(n_hi))
    per_step = max((t_hi - t_lo) / (n_hi - n_lo), 1e-9)

    # Analytic FLOP anchor (VERDICT r4 item 6): hardware-relative MFU so
    # steps/s is comparable beyond its own history. Denominator is the bf16
    # MXU peak — on TPU even the f32 jnp path runs matmuls at XLA default
    # precision = bf16 MXU inputs (CLAUDE.md numerics note).
    from mmbidaf_tpu.utils.flops import peak_bf16_tflops, train_step_flops

    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    step_flops = train_step_flops(cfg, B, n_params)
    achieved_tflops = step_flops / per_step / 1e12
    peak = peak_bf16_tflops(jax.devices()[0].device_kind)

    print(json.dumps({
        "metric": "train_steps_per_sec",
        "value": round(1.0 / per_step, 3),
        "unit": "steps/s",
        "videos_per_sec": round(B / per_step, 2),
        "batch_size": B,
        "p50_step_latency_s": round(per_step, 4),
        "compile_s": round(compile_s, 1),
        "train_step_tflops": round(step_flops / 1e12, 4),
        "achieved_tflops": round(achieved_tflops, 2),
        "mfu": round(achieved_tflops / peak, 4) if peak else None,
        "n_params": n_params,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    from bench import _install_sigterm  # SIGTERM unwinds; see bench.py

    _install_sigterm()
    try:
        main()
    except KeyboardInterrupt:
        raise SystemExit(130)
