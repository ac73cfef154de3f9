"""A/B: serial train loop vs DevicePrefetcher-pipelined loop (one process).

ROADMAP item 7 left the TPU measurement of the pipelined training loop
pending (backend outage). Measuring via two ``train.py`` CLI runs would pay
the relay claim handshake twice (7+ min each — CLAUDE.md); this harness runs
BOTH arms in one process on one claim:

  arm A (serial):   next(stream) -> jnp.asarray+shard_batch -> train_step
  arm B (prefetch): DevicePrefetcher(depth) does collate+H2D in a thread
                    under the device step (exactly train.py --prefetch N)

Both arms use train.py's windowed-fetch pattern (one blocking metric fetch
per window), so the difference isolates what the prefetch thread hides:
host batch generation + H2D upload. Timing is whole-window wall time after
a compile/warmup window — the chained-dispatch slope method does not apply
here because the host work under test is ON the critical path by design.

    python experiments/prefetch_ab.py [--steps 40] [--batch 32] [--depth 2]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40, help="measured steps per arm")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--depth", type=int, default=2, help="prefetch depth (arm B)")
    ap.add_argument("--quick", action="store_true", help="small shapes (CPU smoke)")
    ap.add_argument("--pallas", action="store_true",
                    help="fused-kernel training path (bench_train --pallas)")
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import build_bench_config, enable_compilation_cache

    if jax.default_backend() != "cpu":
        enable_compilation_cache()
    from mmbidaf_tpu.data.prefetch import DevicePrefetcher
    from mmbidaf_tpu.data.synthetic import batch_stream, random_word_vectors
    from mmbidaf_tpu.models.mmbidaf import mmbidaf_init
    from mmbidaf_tpu.parallel import make_mesh, shard_batch
    from mmbidaf_tpu.train.loop import init_train_state, make_train_step

    cfg = build_bench_config(a.quick)
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, compute_dtype="float32",
            use_pallas_attention=a.pallas, use_pallas_lstm=a.pallas,
        ),
        train=dataclasses.replace(cfg.train, batch_size=a.batch,
                                  optimizer="adadelta"),
    )
    mesh = make_mesh(cfg.mesh)

    rng = np.random.default_rng(0)
    wv = random_word_vectors(rng, cfg.data.vocab_size, cfg.model.emb_dim)
    params = mmbidaf_init(jax.random.key(0), cfg, jnp.asarray(wv))
    state = init_train_state(jax.random.key(1), params, cfg)
    train_step = make_train_step(cfg)

    def to_device(nb):
        return shard_batch({k: jnp.asarray(v) for k, v in nb.items()}, mesh)

    nbytes = sum(v.nbytes for v in next(batch_stream(0, cfg, a.batch)).values())

    # compile + claim flush on a batch from the same stream family
    t0 = time.perf_counter()
    state, metrics = train_step(state, to_device(next(batch_stream(99, cfg, a.batch))))
    jax.device_get(metrics["loss"])
    compile_s = time.perf_counter() - t0

    def run_arm(depth: int) -> float:
        """Wall seconds for a.steps steps, one blocking fetch at the end."""
        nonlocal state
        stream = batch_stream(7, cfg, a.batch)  # same data both arms
        pf = None
        if depth > 0:
            pf = DevicePrefetcher(stream, to_device, depth=depth)
        try:
            # warmup: let the prefetch queue fill / absorb first-call jitter
            for _ in range(2):
                item = next(pf) if pf else None
                batch = item[1] if pf else to_device(next(stream))
                state, metrics = train_step(state, batch)
            jax.device_get(metrics["loss"])
            t0 = time.perf_counter()
            for _ in range(a.steps):
                item = next(pf) if pf else None
                batch = item[1] if pf else to_device(next(stream))
                state, metrics = train_step(state, batch)
            jax.device_get(metrics["loss"])  # window barrier (train.py pattern)
            return time.perf_counter() - t0
        finally:
            if pf is not None:
                pf.close()

    serial_s = run_arm(0)
    pipelined_s = run_arm(a.depth)
    # second serial pass guards against drift (claim warm-up, host noise)
    serial2_s = run_arm(0)
    serial_best = min(serial_s, serial2_s)

    out = {
        "metric": "prefetch_speedup",
        "value": round(serial_best / pipelined_s, 3),
        "unit": "x (serial/pipelined wall time)",
        "steps": a.steps,
        "batch_size": a.batch,
        "depth": a.depth,
        "host_mb_per_batch": round(nbytes / 1e6, 2),
        "serial_steps_per_s": round(a.steps / serial_best, 3),
        "pipelined_steps_per_s": round(a.steps / pipelined_s, 3),
        "serial_s": [round(serial_s, 2), round(serial2_s, 2)],
        "pipelined_s": round(pipelined_s, 2),
        "compile_s": round(compile_s, 1),
        "backend": jax.default_backend(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    from bench import _install_sigterm  # SIGTERM unwinds cleanly; see bench.py

    _install_sigterm()
    try:
        main()
    except KeyboardInterrupt:
        raise SystemExit(130)
