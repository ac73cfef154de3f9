"""Fused Pallas Winograd kernel vs XLA direct conv at deep VGG shapes (TPU).

    python experiments/winograd_pallas_profile.py --n 128
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
from mmbidaf_tpu.ops.pallas.winograd_kernel import winograd_conv3x3_fused  # noqa: E402

LAYERS = [
    ("conv3_1", 56, 128, 256),
    ("conv3_2", 56, 256, 256),
    ("conv4_1", 28, 256, 512),
    ("conv4_2", 28, 512, 512),
    ("conv5_x", 14, 512, 512),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--scale_to", type=int, default=512)
    ap.add_argument("--kblk", type=int, default=256)
    args = ap.parse_args()

    print(json.dumps({"backend": jax.default_backend(), "n": args.n}), flush=True)
    for name, hw, cin, cout in LAYERS:
        @jax.jit
        def make(seed, hw=hw, cin=cin, cout=cout):
            ks = jax.random.split(jax.random.key(seed), 3)
            x = jax.random.normal(ks[0], (args.n, hw, hw, cin), jnp.bfloat16)
            w = jax.random.normal(ks[1], (3, 3, cin, cout), jnp.bfloat16) * 0.1
            b = jax.random.normal(ks[2], (cout,), jnp.float32)
            return x, w, b

        x, w, b = make(0)
        useful = conv_flops(args.n, hw, cin, cout)

        @jax.jit
        def xla_step(acc, x, w, b):
            y = lax.conv_general_dilated(
                x + acc.astype(jnp.bfloat16), w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = jnp.maximum(y + b.astype(jnp.bfloat16), 0)
            return jnp.float32(y.mean())

        s = slope_time(xla_step, jnp.float32(0.0), x, w, b)
        print(json.dumps({"op": f"{name}_xla", "tf_s": round(useful / s / 1e12, 1),
                          "ms_at_512": round(s * args.scale_to / args.n * 1e3, 2)}),
              flush=True)

        kblk = min(args.kblk, cout)

        @jax.jit
        def wino_step(acc, x, w, b, kblk=kblk):
            y = winograd_conv3x3_fused(
                x + acc.astype(jnp.bfloat16), w, b, relu=True, k_block=kblk)
            return jnp.float32(y.mean())

        try:
            s = slope_time(wino_step, jnp.float32(0.0), x, w, b)
            print(json.dumps({"op": f"{name}_wino_pallas",
                              "tf_s_useful": round(useful / s / 1e12, 1),
                              "ms_at_512": round(s * args.scale_to / args.n * 1e3, 2)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"op": f"{name}_wino_pallas",
                              "error": str(e)[-400:]}), flush=True)


if __name__ == "__main__":
    main()
