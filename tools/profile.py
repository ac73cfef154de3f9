"""Profiling CLI: trace pipeline/train steps, print the device-op table.

Productizes the tracing subsystem (SURVEY.md §6 "Tracing / profiling" row —
the reference has nothing beyond tqdm + tensorboard curves): one command
answers "where does the step time go" for either the serving pipeline
(raw video batch → summary picks, the bench.py program) or the jitted
training step, using ``utils.profiling.trace`` + ``utils.trace_summary``.

    # serving pipeline on the chip (bench shapes):
    python tools/profile.py --mode serve --steps 5
    # training step, fused-kernel path:
    python tools/profile.py --mode train --steps 5 --pallas
    # quick CPU sanity run (BOTH vars — JAX_PLATFORMS alone is overridden):
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/profile.py --quick

Compilation happens on a warmup call BEFORE the trace starts, so the table
shows steady-state device ops only. The raw Perfetto/XProf trace stays in
``--trace_dir`` for xprof / perfetto.dev deep dives.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _serve_step(cfg, batch_size, vgg_spec):
    """Jitted raw→picks pipeline step + its carried inputs (bench program)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import make_raw_batch_on_device
    from mmbidaf_tpu.data.frontend import (
        apply_frontend, cast_vgg_weights, frontend_init,
    )
    from mmbidaf_tpu.data.synthetic import random_word_vectors
    from mmbidaf_tpu.models.mmbidaf import mmbidaf_decode, mmbidaf_init
    rng = np.random.default_rng(0)
    wv = random_word_vectors(rng, cfg.data.vocab_size, cfg.model.emb_dim)
    params = mmbidaf_init(jax.random.key(0), cfg, jnp.asarray(wv))
    fe = frontend_init(jax.random.key(1), cfg, vgg_spec=vgg_spec)
    fe = cast_vgg_weights(fe, cfg.model.compute_dtype)
    raw = make_raw_batch_on_device(cfg, batch_size)

    # The raw batch (and params) MUST be jit ARGUMENTS, not closure
    # constants: closed-over device arrays are embedded in the HLO as
    # literals, and lowering then ships the 100+ MB frames tensor inside
    # the remote-compile request (HTTP 413 on the tunnelled backend).
    @jax.jit
    def _step(acc, params, fe, raw):
        r = dict(raw)
        r["waveform"] = raw["waveform"] + acc * 1e-12
        batch = apply_frontend(fe, r, cfg, vgg_spec)
        _, picks = mmbidaf_decode(params, batch, cfg)
        return picks.sum().astype(jnp.float32) * 1e-6

    return (lambda acc: _step(acc, params, fe, raw)), jnp.float32(0.0)


def _train_step(cfg, batch_size):
    """Jitted train step closed over one synthetic batch; carries state."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mmbidaf_tpu.data.synthetic import random_word_vectors, synthetic_batch
    from mmbidaf_tpu.models.mmbidaf import mmbidaf_init
    from mmbidaf_tpu.train.loop import init_train_state, make_train_step

    rng = np.random.default_rng(0)
    wv = random_word_vectors(rng, cfg.data.vocab_size, cfg.model.emb_dim)
    params = mmbidaf_init(jax.random.key(0), cfg, jnp.asarray(wv))
    state = init_train_state(jax.random.key(1), params, cfg)
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_batch(rng, cfg, batch_size=batch_size).items()
    }
    inner = make_train_step(cfg)

    def step(state):
        new_state, _ = inner(state, batch)
        return new_state

    return step, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="serve", choices=["serve", "train"])
    ap.add_argument("--quick", action="store_true", help="small shapes (CPU-friendly)")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--steps", type=int, default=5,
                    help="traced steady-state steps (compile stays outside)")
    ap.add_argument("--trace_dir", default=None,
                    help="keep the raw Perfetto/XProf trace here "
                         "(default: a fresh temp dir, path printed)")
    ap.add_argument("--top", type=int, default=20, help="table rows")
    ap.add_argument("--pallas", action="store_true",
                    help="train mode: fused Pallas attention/LSTM kernels")
    ap.add_argument("--json", action="store_true",
                    help="one JSON line per op instead of the table")
    a = ap.parse_args()

    from bench import build_bench_config, enable_compilation_cache

    enable_compilation_cache()
    import jax

    from mmbidaf_tpu.ops.vgg import TINY_SPEC, VGG16_SPEC
    from mmbidaf_tpu.utils.profiling import trace
    from mmbidaf_tpu.utils.trace_summary import summarize_trace

    cfg = build_bench_config(a.quick)
    # Mirror bench.py's spec choice: --quick traces the TINY frontend the
    # quick bench actually runs, not the 13-conv VGG16.
    vgg_spec = TINY_SPEC if a.quick else VGG16_SPEC
    if a.mode == "train":
        # Match bench_train.py: fp32 reference-style autodiff by default,
        # --pallas dispatches the custom-VJP fused kernels.
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model, compute_dtype="float32",
                use_pallas_attention=a.pallas, use_pallas_lstm=a.pallas,
            ),
        )
        batch = a.batch or (8 if a.quick else 32)
        step, carry = _train_step(cfg, batch)
    else:
        batch = a.batch or (8 if a.quick else 64)
        step, carry = _serve_step(cfg, batch, vgg_spec)

    # Warmup: compile + the relay claim/handshake stay OUT of the trace.
    carry = step(carry)
    jax.device_get(jax.tree.leaves(carry)[0])

    trace_dir = a.trace_dir or tempfile.mkdtemp(prefix="mmb_profile_")
    with trace(trace_dir):
        for _ in range(a.steps):
            carry = step(carry)
        jax.device_get(jax.tree.leaves(carry)[0])

    rows = summarize_trace(trace_dir, top_k=a.top)
    if a.json:
        for r in rows:
            print(json.dumps(r))
    else:
        print(f"# {a.mode} x{a.steps} steps, batch {batch}, "
              f"backend {jax.default_backend()} — trace: {trace_dir}")
        print(f"{'op':<48} {'total_ms':>10} {'pct':>6}")
        for r in rows:
            print(f"{r['name'][:48]:<48} {r['total_ms']:>10.2f} {r['pct']:>5.1f}%")


if __name__ == "__main__":
    from bench import _install_sigterm  # SIGTERM unwinds; see bench.py

    _install_sigterm()
    try:
        main()
    except KeyboardInterrupt:
        raise SystemExit(130)
