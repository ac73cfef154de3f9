"""Pallas 3×3 SAME conv kernel (im2col-as-GEMM) — ROADMAP item 1 prototype.

The e2e pipeline is bound by the VGG conv stack, which XLA's conv codegen
runs at ~37% MXU on this backend (round-1 trace). This kernel recasts the
3×3 stride-1 SAME convolution as an explicit im2col GEMM, the canonical
MXU-native formulation:

- grid over (batch, H-tiles); each program DMAs its input slab
  ``[tile_h+2, W+2, Cin]`` from HBM into VMEM scratch (double-bufferable),
- builds the ``[tile_h·W, 9·Cin]`` patch matrix with nine static shifted
  slices (pure VMEM moves, no gather),
- one MXU GEMM against the reshaped ``[9·Cin, Cout]`` filter + bias + ReLU.

Weight layout: ``w3x3 [3, 3, Cin, Cout]`` is reshaped to ``[9·Cin, Cout]``
with (ky, kx, cin) ordering — exactly the patch column order.

Parity-tested (interpret mode) against ``lax.conv_general_dilated``; TPU
timing vs XLA conv is a round-2 task (fresh compiles on this backend cost
~10 min each).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv3x3_kernel(x_hbm, w_ref, b_ref, out_ref, x_vmem, sem, *,
                    tile_h: int, W: int, Cin: int, Cout: int, relu: bool):
    n = pl.program_id(0)
    hi = pl.program_id(1)

    # DMA slices only the (untiled) H dim — the W dim is transferred whole
    # (it is pre-padded to an 8-multiple; Mosaic requires tiled-dim slices
    # to be tiling-aligned).
    dma = pltpu.make_async_copy(
        x_hbm.at[n, pl.ds(hi * tile_h, tile_h + 2), :, :],
        x_vmem,
        sem,
    )
    dma.start()
    dma.wait()

    cols = []
    for dy in range(3):
        for dx in range(3):
            # dx shifts land on the sublane dim; use a cyclic roll (supported
            # for any shift) + aligned [0:W] slice instead of an unaligned
            # offset slice. The wrapped tail columns are never read.
            w_vmem = x_vmem.shape[1]
            shifted = (
                pltpu.roll(x_vmem[dy:dy + tile_h], w_vmem - dx, axis=1)
                if dx else x_vmem[dy:dy + tile_h]
            )
            cols.append(shifted[:, 0:W, :].reshape(tile_h * W, Cin))
    patch = jnp.concatenate(cols, axis=1)  # [tile_h*W, 9*Cin]
    out = jnp.dot(patch, w_ref[:], preferred_element_type=jnp.float32) + b_ref[0]
    if relu:
        out = jnp.maximum(out, 0.0)
    out_ref[0] = out.reshape(tile_h, W, Cout).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("tile_h", "relu", "interpret"))
def conv3x3_same(
    x: jax.Array,
    w3x3: jax.Array,
    b: jax.Array,
    tile_h: int = 8,
    relu: bool = True,
    interpret: bool | None = None,
) -> jax.Array:
    """``x [N, H, W, Cin]`` ⊛ ``w3x3 [3, 3, Cin, Cout]`` + b → ``[N, H, W, Cout]``."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N, H, W, Cin = x.shape
    Cout = w3x3.shape[-1]
    assert H % tile_h == 0, f"H={H} must divide tile_h={tile_h}"
    assert W % 8 == 0, f"W={W} must be 8-aligned for the output block"
    dtype = x.dtype

    # Pad H by the conv halo; pad W by the halo AND up to an 8-multiple so
    # full-width DMA slabs satisfy Mosaic's tiled-dim alignment.
    w_total = W + 2
    w_align = (-w_total) % 8
    x_pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1 + w_align), (0, 0)))
    w_flat = w3x3.reshape(9 * Cin, Cout).astype(dtype)

    return pl.pallas_call(
        partial(_conv3x3_kernel, tile_h=tile_h, W=W, Cin=Cin, Cout=Cout, relu=relu),
        out_shape=jax.ShapeDtypeStruct((N, H, W, Cout), dtype),
        grid=(N, H // tile_h),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # padded input stays in HBM
            pl.BlockSpec((9 * Cin, Cout), lambda n, h: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda n, h: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, W, Cout), lambda n, h: (n, h, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2, w_total + w_align, Cin), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * N * H * W * 9 * Cin * Cout,
            bytes_accessed=x.dtype.itemsize * (N * H * W * (Cin + Cout)) + w_flat.size * 4,
            transcendentals=0,
        ),
    )(x_pad, w_flat, b.astype(dtype)[None])
