"""Per-layer VGG conv profiling on the real chip (round-2 conv attack).

Times each VGG-16 conv layer shape at the bench batch (512 images), in
bf16 and int8, plus MXU calibration GEMMs, using the chained-dispatch
slope method (bench.py::bench_jax — wall-clock per call is meaningless on
this relay backend).

    python experiments/conv_profile.py [--n 128] [--layers all]

Writes one JSON line per measurement to stdout.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def slope_time(step, init_acc, *args, lo=2, hi=8, reps=2):
    """Seconds per call via chained-dispatch slope. Extra operands are passed
    as ARGUMENTS (closure-captured device arrays get embedded as literal
    constants in the remote-compile request body — CLAUDE.md)."""
    jax.device_get(step(init_acc, *args))  # compile

    def run(m):
        t0 = time.perf_counter()
        acc = init_acc
        for _ in range(m):
            acc = step(acc, *args)
        jax.device_get(acc)
        return time.perf_counter() - t0

    run(1)
    t_lo = min(run(lo) for _ in range(reps))
    t_hi = min(run(hi) for _ in range(reps))
    return max((t_hi - t_lo) / (hi - lo), 1e-9)


def conv_flops(n, hw, cin, cout):
    return 2.0 * n * hw * hw * cin * cout * 9


def time_conv_bf16(n, hw, cin, cout):
    key = jax.random.key(0)

    @jax.jit
    def make(seed):
        ks = jax.random.split(jax.random.key(seed), 2)
        x = jax.random.normal(ks[0], (n, hw, hw, cin), jnp.bfloat16)
        w = jax.random.normal(ks[1], (3, 3, cin, cout), jnp.bfloat16)
        return x, w

    x, w = make(0)

    @jax.jit
    def step(acc, x, w):
        xx = x + acc.astype(jnp.bfloat16)
        y = lax.conv_general_dilated(
            xx, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return jnp.float32(y.mean())

    s = slope_time(step, jnp.float32(0.0), x, w)
    return s, conv_flops(n, hw, cin, cout) / s / 1e12


def time_conv_int8(n, hw, cin, cout):
    @jax.jit
    def make(seed):
        ks = jax.random.split(jax.random.key(seed), 2)
        x = jax.random.randint(ks[0], (n, hw, hw, cin), -127, 127, jnp.int8)
        w = jax.random.randint(ks[1], (3, 3, cin, cout), -127, 127, jnp.int8)
        return x, w

    x, w = make(0)

    @jax.jit
    def step(acc, x, w):
        xx = x + (acc % 2).astype(jnp.int8)
        y = lax.conv_general_dilated(
            xx, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        return jnp.int32(y.sum() % 1024) + acc

    s = slope_time(step, jnp.int32(0), x, w)
    return s, conv_flops(n, hw, cin, cout) / s / 1e12


def time_gemm(m, k, n_, dtype):
    @jax.jit
    def make(seed):
        ks = jax.random.split(jax.random.key(seed), 2)
        if dtype == jnp.int8:
            a = jax.random.randint(ks[0], (m, k), -127, 127, jnp.int8)
            b = jax.random.randint(ks[1], (k, n_), -127, 127, jnp.int8)
        else:
            a = jax.random.normal(ks[0], (m, k), dtype)
            b = jax.random.normal(ks[1], (k, n_), dtype)
        return a, b

    a, b = make(0)
    if dtype == jnp.int8:

        @jax.jit
        def step(acc, a, b):
            aa = a + (acc % 2).astype(jnp.int8)
            y = jnp.dot(aa, b, preferred_element_type=jnp.int32)
            return jnp.int32(y.sum() % 1024) + acc

        s = slope_time(step, jnp.int32(0), a, b)
    else:

        @jax.jit
        def step(acc, a, b):
            aa = a + acc.astype(dtype)
            y = jnp.dot(aa, b, preferred_element_type=jnp.float32)
            return jnp.float32(y.mean())

        s = slope_time(step, jnp.float32(0.0), a, b)
    return s, 2.0 * m * k * n_ / s / 1e12


VGG_LAYERS = [
    # (name, hw, cin, cout)
    ("conv1_1", 224, 3, 64),
    ("conv1_2", 224, 64, 64),
    ("conv2_1", 112, 64, 128),
    ("conv2_2", 112, 128, 128),
    ("conv3_1", 56, 128, 256),
    ("conv3_2", 56, 256, 256),
    ("conv4_1", 28, 256, 512),
    ("conv4_2", 28, 512, 512),
    ("conv5_x", 14, 512, 512),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=128, help="image batch per layer test")
    ap.add_argument("--scale_to", type=int, default=512, help="report times scaled to this batch")
    ap.add_argument("--skip_int8", action="store_true")
    ap.add_argument("--skip_full", action="store_true")
    args = ap.parse_args()

    print(json.dumps({"backend": jax.default_backend(), "n": args.n}), flush=True)

    for mkn, dt, tag in [
        ((4096, 4096, 4096), jnp.bfloat16, "gemm_bf16"),
        ((4096, 4096, 4096), jnp.int8, "gemm_int8"),
    ]:
        s, tf = time_gemm(*mkn, dt)
        print(json.dumps({"op": tag, "s": round(s, 5), "tf_s": round(tf, 1)}), flush=True)

    total_bf16 = 0.0
    for name, hw, cin, cout in VGG_LAYERS:
        mult = 3 if name == "conv5_x" else (2 if name in ("conv3_2", "conv4_2") else 1)
        s, tf = time_conv_bf16(args.n, hw, cin, cout)
        scaled = s * args.scale_to / args.n * mult
        total_bf16 += scaled
        print(json.dumps({"op": f"{name}_bf16", "s_per_call": round(s, 5),
                          "tf_s": round(tf, 1), "x_layers": mult,
                          "ms_at_512": round(scaled * 1e3, 2)}), flush=True)
        if not args.skip_int8:
            s8, tf8 = time_conv_int8(args.n, hw, cin, cout)
            print(json.dumps({"op": f"{name}_int8", "s_per_call": round(s8, 5),
                              "tf_s": round(tf8, 1),
                              "ms_at_512": round(s8 * args.scale_to / args.n * mult * 1e3, 2)}),
                  flush=True)
    print(json.dumps({"op": "vgg_conv_total_bf16_at_512", "ms": round(total_bf16 * 1e3, 1)}),
          flush=True)

    if not args.skip_full:
        # Full VGG forward (convs+pools+fcs) at the bench image batch.
        from mmbidaf_tpu.ops.vgg import VGG16_SPEC, vgg_features, vgg_init

        params = vgg_init(jax.random.key(0), VGG16_SPEC, 224, 4096)
        params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

        @jax.jit
        def make_imgs(seed):
            return jax.random.normal(jax.random.key(seed), (args.n, 224, 224, 3), jnp.bfloat16)

        imgs = make_imgs(0)

        @jax.jit
        def step(acc, params, imgs):
            y = vgg_features(params, imgs + acc.astype(jnp.bfloat16), VGG16_SPEC)
            return jnp.float32(y.mean())

        s = slope_time(step, jnp.float32(0.0), params, imgs)
        print(json.dumps({"op": "vgg_full_bf16", "s_per_call": round(s, 4),
                          "ms_at_512": round(s * args.scale_to / args.n * 1e3, 1)}), flush=True)


if __name__ == "__main__":
    main()
