"""Winograd F(2x2,3x3) vs XLA direct conv at VGG layer shapes (TPU).

    python experiments/winograd_profile.py --n 128
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from experiments.conv_profile import slope_time, conv_flops  # noqa: E402
from mmbidaf_tpu.ops.winograd import winograd_conv3x3  # noqa: E402

LAYERS = [
    ("conv1_2", 224, 64, 64),
    ("conv2_2", 112, 128, 128),
    ("conv3_2", 56, 256, 256),
    ("conv4_2", 28, 512, 512),
    ("conv5_x", 14, 512, 512),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--scale_to", type=int, default=512)
    ap.add_argument("--chunks", default="32,64")
    args = ap.parse_args()
    chunks = [int(c) for c in args.chunks.split(",")]

    print(json.dumps({"backend": jax.default_backend(), "n": args.n}), flush=True)
    for name, hw, cin, cout in LAYERS:
        @jax.jit
        def make(seed, hw=hw, cin=cin, cout=cout):
            ks = jax.random.split(jax.random.key(seed), 2)
            x = jax.random.normal(ks[0], (args.n, hw, hw, cin), jnp.bfloat16)
            w = jax.random.normal(ks[1], (3, 3, cin, cout), jnp.bfloat16) * 0.1
            return x, w

        x, w = make(0)
        useful = conv_flops(args.n, hw, cin, cout)

        @jax.jit
        def xla_step(acc, x, w):
            y = lax.conv_general_dilated(
                x + acc.astype(jnp.bfloat16), w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.float32(y.mean())

        s = slope_time(xla_step, jnp.float32(0.0), x, w)
        print(json.dumps({"op": f"{name}_xla", "tf_s": round(useful / s / 1e12, 1),
                          "ms_at_512": round(s * args.scale_to / args.n * 1e3, 2)}),
              flush=True)

        @jax.jit
        def win_step(acc, x, w):
            y = winograd_conv3x3(x + acc.astype(jnp.bfloat16), w)
            return jnp.float32(y.mean())

        s = slope_time(win_step, jnp.float32(0.0), x, w)
        print(json.dumps({"op": f"{name}_win",
                          "tf_s_useful": round(useful / s / 1e12, 1),
                          "ms_at_512": round(s * args.scale_to / args.n * 1e3, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
