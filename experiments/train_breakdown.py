"""Decompose the training step at bench shapes (batch 32, feature-level):
forward vs backward vs optimizer, and per-component grad costs.

    python experiments/train_breakdown.py [--pallas]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from experiments.conv_profile import slope_time  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--drop", type=float, default=0.2)
    a = ap.parse_args()

    from bench import build_bench_config
    from mmbidaf_tpu.data.synthetic import random_word_vectors, synthetic_batch
    from mmbidaf_tpu.models.mmbidaf import mmbidaf_apply, mmbidaf_init
    from mmbidaf_tpu.train.loop import init_train_state, make_train_step, nll_loss

    cfg = build_bench_config(False)
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, compute_dtype="float32",
            use_pallas_attention=a.pallas, use_pallas_lstm=a.pallas,
            drop_prob=a.drop,
        ),
        train=dataclasses.replace(cfg.train, optimizer="adadelta"),
    )
    B = 32
    rng = np.random.default_rng(0)
    wv = random_word_vectors(rng, cfg.data.vocab_size, cfg.model.emb_dim)
    params = mmbidaf_init(jax.random.key(0), cfg, jnp.asarray(wv))
    state = init_train_state(jax.random.key(1), params, cfg)
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(rng, cfg, batch_size=B).items()}
    print(json.dumps({"backend": jax.default_backend(), "pallas": a.pallas,
                      "drop": a.drop}), flush=True)

    def report(tag, step, init, *args):
        s = slope_time(step, init, *args)
        print(json.dumps({"op": tag, "ms": round(s * 1e3, 3)}), flush=True)

    key = jax.random.key(7)

    # forward-only loss
    @jax.jit
    def fwd(acc, params, batch):
        b = dict(batch)
        b["images"] = batch["images"] + acc * 1e-9
        log_p = mmbidaf_apply(params, b, cfg, rng=key)
        return nll_loss(log_p, b["targets"], b["target_mask"])

    report("forward_loss", fwd, jnp.float32(0.0), params, batch)

    # value+grad (no optimizer)
    @jax.jit
    def vg(acc, params, batch):
        b = dict(batch)
        b["images"] = batch["images"] + acc * 1e-9

        def loss_fn(p):
            log_p = mmbidaf_apply(p, b, cfg, rng=key)
            return nll_loss(log_p, b["targets"], b["target_mask"])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        return loss + 1e-12 * jax.tree.reduce(
            lambda x, y: x + y, jax.tree.map(lambda g: g.sum(), grads)
        )

    report("value_and_grad", vg, jnp.float32(0.0), params, batch)

    # decoder-only grad on fixed M
    from mmbidaf_tpu.models.decoder import decoder_apply

    @jax.jit
    def mk_M(seed):
        return jax.random.normal(jax.random.key(seed),
                                 (B, cfg.data.max_sentences, 2 * cfg.model.hidden_size))

    M = mk_M(0)

    @jax.jit
    def dec(acc, dp, M, batch):
        Mx = M + acc * 1e-9

        def loss_fn(p):
            log_p, _ = decoder_apply(p, Mx, batch["sent_mask"],
                                     targets=batch["targets"],
                                     num_steps=cfg.model.max_decode_steps,
                                     teacher_forcing=True)
            return nll_loss(log_p, batch["targets"], batch["target_mask"])

        loss, grads = jax.value_and_grad(loss_fn)(dp)
        return loss + 1e-12 * jax.tree.reduce(
            lambda x, y: x + y, jax.tree.map(lambda g: g.sum(), grads)
        )

    report("decoder_grad", dec, jnp.float32(0.0), params["decoder"], M, batch)

    # Full step LAST: the donated train_step frees the params buffers.
    # full step (non-donated copy so the chained harness can reuse state)
    train_step = make_train_step(cfg)
    st = state

    def full(acc, batch):
        nonlocal st
        st, m = train_step(st, batch)
        return m["loss"]

    # slope over the python closure: time via explicit loop
    import time as _t
    jax.device_get(full(jnp.float32(0), batch))

    def run(m):
        t0 = _t.perf_counter()
        last = None
        for _ in range(m):
            last = full(None, batch)
        jax.device_get(last)
        return _t.perf_counter() - t0

    run(1)
    t_lo = min(run(2), run(2))
    t_hi = min(run(10), run(10))
    print(json.dumps({"op": "full_train_step", "ms": round((t_hi - t_lo) / 8 * 1e3, 3)}),
          flush=True)



if __name__ == "__main__":
    main()
