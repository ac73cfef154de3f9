"""A/B: greedy vs beam-search end-to-end serving cost on the bench config.

Beam export/serving (round 3) raises the obvious ops question: what does
beam width cost at serving time? Model towers + decode + audio are ~1.2 ms
of the 110.6 ms batch-32 pipeline (docs/KERNELS.md breakdown), so beam
should be nearly free — this measures it instead of assuming it.

One process, one TPU claim, both arms timed with bench.py's
chained-dispatch slope method. The greedy arm is bit-identical HLO to
`python bench.py` (same step_fn shape), so it deserializes from the
persistent cache; only the beam arm pays a fresh compile.

    python experiments/beam_ab.py [--batch 64] [--width 4] [--quick]

Prints one JSON line: videos/s per arm + the beam/greedy ratio.
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
    ap.add_argument("--width", type=int, default=4, help="beam width")
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
    from mmbidaf_tpu.data.synthetic import random_word_vectors
    from mmbidaf_tpu.models.mmbidaf import mmbidaf_decode, mmbidaf_init
    from mmbidaf_tpu.ops.vgg import TINY_SPEC, VGG16_SPEC

    cfg = build_bench_config(args.quick)
    vgg_spec = TINY_SPEC if args.quick else VGG16_SPEC

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
    acc0 = jnp.float32(0.0)

    def make_step(mode):
        def step_fn(params, fe, raw, acc):
            r = dict(raw)
            r["waveform"] = raw["waveform"] + acc * 1e-12
            batch = apply_frontend(fe, r, cfg, vgg_spec)
            if mode == "greedy":
                # EXACTLY bench.py::step_fn — same HLO, warm cache hit
                _, picks = mmbidaf_decode(params, batch, cfg)
            else:
                _, picks = mmbidaf_decode(
                    params, batch, cfg, mode="beam", topk=args.width
                )
            return picks.sum().astype(jnp.float32) * 1e-6

        return jax.jit(step_fn)

    def slope(step, iters):
        def run(m):
            t0 = time.perf_counter()
            acc = acc0
            for _ in range(m):
                acc = step(params, fe, raw, acc)
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
    for mode in ("greedy", "beam"):
        step = make_step(mode)
        t0 = time.perf_counter()
        jax.device_get(step(params, fe, raw, acc0))
        compile_s = time.perf_counter() - t0
        per_batch = slope(step, args.iters)
        arms[mode] = {
            "videos_per_sec_per_chip": round(args.batch / per_batch, 1),
            "p50_batch_latency_s": round(per_batch, 4),
            "compile_s": round(compile_s, 1),
        }

    out = {
        "experiment": "beam_ab",
        "batch_size": args.batch,
        "beam_width": args.width,
        "backend": jax.default_backend(),
        "claim_s": round(claim_s, 1),
        **{f"{k}_{m}": v for m, a in arms.items() for k, v in a.items()},
        "beam_over_greedy": round(
            arms["beam"]["p50_batch_latency_s"]
            / arms["greedy"]["p50_batch_latency_s"],
            3,
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    try:
        main()
    except KeyboardInterrupt:
        print("interrupted; exiting cleanly", file=sys.stderr)
        raise SystemExit(130)
