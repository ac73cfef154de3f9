"""Fused Pallas frame-preprocess kernel (ROADMAP round-3 open item 1).

One pass over the raw keyframes: uint8→f32 convert, BOTH separable-bilinear
resize contractions, /255 and the ImageNet normalization — per image, the
uint8 rows are read from HBM exactly once and only the normalized
``[S, S, 3]`` output is written back. The jnp path
(``ops.vgg.preprocess_frames``) runs the same math as two XLA einsums but
pays a u8→f32 materialization pass and an inter-GEMM round-trip (~1.6 ms of
the 110.6 ms batch-32 serving program; docs/KERNELS.md roofline).

Formulation (channels stay interleaved — no in-kernel transpose):
  view ``x`` as ``[H, W*3]``; then
  ``out[s, k*3+c] = Σ_{h,w} rh[s,h] · x[h, w*3+c] · rw3[w*3+c, k*3+c] - β_c``
  with ``rw3 = kron(rwᵀ, diag(1/(255·std)))`` — the W-axis resize as a plain
  GEMM against a block-sparse (kron) matrix, the /255 and the per-channel
  std folded into its columns, and ``β = mean/std`` a length-``S*3`` epilogue
  vector. The kron triples GEMM-2's MACs vs the dense einsum, but both
  GEMMs run per-image entirely in VMEM: MXU-bound floor ≈ 1.1 ms at the
  serving shapes (512 × 240×320 → 224²).

Numerics: exactly ``jax.image.resize``'s antialiased half-pixel bilinear
kernel (the weight matrices come from ``ops.vgg.resize_matrix``), computed
in f32 regardless of the output dtype — parity-tested against
``preprocess_frames`` in interpret mode on CPU and compiled on TPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mmbidaf_tpu.ops.vgg import IMAGENET_MEAN, IMAGENET_STD, resize_matrix


def _preprocess_kernel(x_ref, rh_ref, rw3_ref, bias_ref, out_ref):
    # Mosaic has no direct u8→f32 cast; widen through i32.
    x = x_ref[0].astype(jnp.int32).astype(jnp.float32)   # [H, W*3]
    t = jnp.dot(rh_ref[:], x, preferred_element_type=jnp.float32)   # [S, W*3]
    y = jnp.dot(t, rw3_ref[:], preferred_element_type=jnp.float32)  # [S, S*3]
    out_ref[0] = (y - bias_ref[:]).astype(out_ref.dtype)


def _preprocess_consts(s: int, h: int, w: int):
    """(rh [S,H], rw3 [W*3,S*3], bias [1,S*3]) — constant-folded under jit."""
    rh = resize_matrix(s, h)                              # [S, H]
    rw = resize_matrix(s, w)                              # [S, W]
    scale = (1.0 / (255.0 * IMAGENET_STD)).astype(jnp.float32)      # [3]
    eye3 = jnp.eye(3, dtype=jnp.float32) * scale[None, :]
    # rw3[w*3+c, k*3+c2] = rw[k, w] · δ(c,c2) / (255·std_c2)
    rw3 = jnp.einsum("kw,cd->wckd", rw, eye3).reshape(w * 3, s * 3)
    bias = jnp.tile((IMAGENET_MEAN / IMAGENET_STD).astype(jnp.float32), s)
    return rh, rw3, bias.reshape(1, s * 3)


@partial(jax.jit, static_argnames=("image_size", "dtype", "interpret"))
def preprocess_frames_fused(
    frames_uint8: jax.Array,
    image_size: int,
    dtype=jnp.float32,
    interpret: bool | None = None,
) -> jax.Array:
    """Raw ``[N, H, W, 3] uint8`` frames → normalized ``[N, S, S, 3]``
    floats in one Pallas pass (drop-in for ``ops.vgg.preprocess_frames``)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, h, w, _ = frames_uint8.shape
    s = image_size
    rh, rw3, bias = _preprocess_consts(s, h, w)
    x = frames_uint8.reshape(n, h, w * 3)

    grid_spec = pl.GridSpec(
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w * 3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w * 3, s * 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s * 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s, s * 3), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _preprocess_kernel,
        out_shape=jax.ShapeDtypeStruct((n, s, s * 3), jnp.dtype(dtype)),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * s * w * 3 * (h + s),
            bytes_accessed=n * (h * w * 3 + s * s * 3 * jnp.dtype(dtype).itemsize)
            + 4 * (s * h + w * 3 * s * 3),
            transcendentals=0,
        ),
    )(x, rh, rw3, bias)
    return out.reshape(n, s, s, 3)
