"""Standalone TPU timing: jnp two-GEMM preprocess vs fused Pallas kernel.

ROADMAP round-3 open item 1 — measures JUST the preprocess stage at the
serving shapes (512 frames of 240x320 -> 224^2, bf16 output) with the
chained-dispatch slope method (bench.py::bench_jax — block_until_ready is a
no-op on this relay backend).

Run: timeout 1200 python experiments/preprocess_profile.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mmbidaf_tpu.ops.vgg import preprocess_frames
from mmbidaf_tpu.ops.pallas.preprocess_kernel import preprocess_frames_fused


def slope_time(step, x, iters=8):
    acc0 = jnp.float32(0.0)
    t0 = time.perf_counter()
    jax.device_get(step(x, acc0))
    compile_s = time.perf_counter() - t0

    def run(m):
        acc = acc0
        t0 = time.perf_counter()
        for _ in range(m):
            acc = step(x, acc)
        jax.device_get(acc)
        return time.perf_counter() - t0

    run(1)
    t_lo = min(run(2), run(2))
    t_hi = min(run(2 + iters), run(2 + iters))
    return (t_hi - t_lo) / iters, compile_s


def main():
    N, H, W, S = 512, 240, 320, 224
    dtype = jnp.bfloat16
    print(f"backend={jax.default_backend()} devices={jax.device_count()}")
    t0 = time.perf_counter()
    jax.device_get(jnp.zeros((), jnp.float32) + 1.0)
    print(f"claim_s={time.perf_counter() - t0:.1f}")

    key = jax.random.key(0)
    x = jax.random.randint(key, (N, H, W, 3), 0, 256, jnp.int32).astype(jnp.uint8)

    @jax.jit
    def step_jnp(x, acc):
        out = preprocess_frames(x, S, dtype=dtype)
        return out.astype(jnp.float32).sum() * 1e-9 + acc * 1e-12

    @jax.jit
    def step_fused(x, acc):
        out = preprocess_frames_fused(x, S, dtype=dtype)
        return out.astype(jnp.float32).sum() * 1e-9 + acc * 1e-12

    for name, step in [("jnp_two_gemm", step_jnp), ("pallas_fused", step_fused)]:
        per, compile_s = slope_time(step, x)
        print(f"{name}: {per * 1e3:.3f} ms/batch  (compile {compile_s:.1f} s)")

    # numerical sanity on-device
    a = preprocess_frames(x[:4], S, dtype=jnp.float32)
    b = preprocess_frames_fused(x[:4], S, dtype=jnp.float32)
    print("max_abs_diff_f32:", float(jnp.max(jnp.abs(a - b))))


if __name__ == "__main__":
    main()
