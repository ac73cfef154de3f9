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
            # dx shifts are static unaligned slices on the sublane dim —
            # Mosaic lowers these as vector shifts (the 8/16-alignment rule
            # only applies to DMA memref slicing, which stays full-width).
            cols.append(
                x_vmem[dy:dy + tile_h, dx:dx + W, :].reshape(tile_h * W, Cin)
            )
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

    # Pad H by the conv halo; pad W by the halo AND up to the dtype's sublane
    # tile (8 for f32, 16 for bf16, 32 for int8); pad Cin up to the 128-lane
    # tile — Mosaic's memref slicing requires both tiled dims at tile
    # granularity. (Cin padding is free for the Cin ≥ 128 layers that carry
    # most of the VGG FLOPs; zero rows in the filter keep results exact.)
    sublane = {4: 8, 2: 16, 1: 32}[jnp.dtype(dtype).itemsize]
    w_total = W + 2
    w_align = (-w_total) % sublane
    c_align = (-Cin) % 128
    x_pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1 + w_align), (0, c_align)))
    w_flat = (
        jnp.pad(w3x3, ((0, 0), (0, 0), (0, c_align), (0, 0)))
        .reshape(9 * (Cin + c_align), Cout)
        .astype(dtype)
    )
    Cin_p = Cin + c_align

    return pl.pallas_call(
        partial(_conv3x3_kernel, tile_h=tile_h, W=W, Cin=Cin_p, Cout=Cout, relu=relu),
        out_shape=jax.ShapeDtypeStruct((N, H, W, Cout), dtype),
        grid=(N, H // tile_h),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # padded input stays in HBM
            pl.BlockSpec((9 * Cin_p, Cout), lambda n, h: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda n, h: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, W, Cout), lambda n, h: (n, h, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2, w_total + w_align, Cin_p), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * N * H * W * 9 * Cin_p * Cout,
            bytes_accessed=x.dtype.itemsize * (N * H * W * (Cin + Cout)) + w_flat.size * 4,
            transcendentals=0,
        ),
    )(x_pad, w_flat, b.astype(dtype)[None])


def _conv3x3_acc_kernel(x_hbm, w_ref, b_ref, out_ref, x_vmem, sem, *,
                        tile_h: int, W: int, Cin: int, Cout: int, relu: bool):
    """Variant B: no im2col materialization — nine accumulated GEMMs.

    ``out = Σ_k patch_k @ w_k`` where ``patch_k`` is a shifted VIEW of the
    slab; avoids the 9-way concat (a large VPU copy) at the cost of K=Cin
    GEMMs (still MXU-shaped once Cin ≥ 128).
    """
    n = pl.program_id(0)
    hi = pl.program_id(1)
    dma = pltpu.make_async_copy(
        x_hbm.at[n, pl.ds(hi * tile_h, tile_h + 2), :, :], x_vmem, sem
    )
    dma.start()
    dma.wait()

    acc = jnp.zeros((tile_h * W, Cout), jnp.float32)
    k = 0
    for dy in range(3):
        for dx in range(3):
            patch = x_vmem[dy:dy + tile_h, dx:dx + W, :].reshape(tile_h * W, Cin)
            acc = acc + jnp.dot(
                patch, w_ref[k], preferred_element_type=jnp.float32
            )
            k += 1
    out = acc + b_ref[0]
    if relu:
        out = jnp.maximum(out, 0.0)
    out_ref[0] = out.reshape(tile_h, W, Cout).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("tile_h", "relu", "interpret"))
def conv3x3_same_acc(
    x: jax.Array,
    w3x3: jax.Array,
    b: jax.Array,
    tile_h: int = 8,
    relu: bool = True,
    interpret: bool | None = None,
) -> jax.Array:
    """Accumulated-GEMM variant of ``conv3x3_same`` (same contract)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N, H, W, Cin = x.shape
    Cout = w3x3.shape[-1]
    assert H % tile_h == 0 and W % 8 == 0
    dtype = x.dtype
    sublane = {4: 8, 2: 16, 1: 32}[jnp.dtype(dtype).itemsize]
    w_total = W + 2
    w_align = (-w_total) % sublane
    c_align = (-Cin) % 128
    x_pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1 + w_align), (0, c_align)))
    w_k = (
        jnp.pad(w3x3, ((0, 0), (0, 0), (0, c_align), (0, 0)))
        .reshape(9, Cin + c_align, Cout)
        .astype(dtype)
    )
    Cin_p = Cin + c_align

    return pl.pallas_call(
        partial(_conv3x3_acc_kernel, tile_h=tile_h, W=W, Cin=Cin_p, Cout=Cout, relu=relu),
        out_shape=jax.ShapeDtypeStruct((N, H, W, Cout), dtype),
        grid=(N, H // tile_h),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((9, Cin_p, Cout), lambda n, h: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda n, h: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, W, Cout), lambda n, h: (n, h, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2, w_total + w_align, Cin_p), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * N * H * W * 9 * Cin_p * Cout,
            bytes_accessed=x.dtype.itemsize * (N * H * W * (Cin + Cout)),
            transcendentals=0,
        ),
    )(x_pad, w_k, b.astype(dtype)[None])


def _conv3x3_db_kernel(x_hbm, w_ref, b_ref, out_ref, slab, sem, *,
                       tile_h: int, W: int, Cin: int, Cout: int, relu: bool):
    """Variant C: double-buffered input slabs — the next H-tile's DMA is in
    flight while the current tile computes (guide: 'Patterns: Double
    Buffering'). Grid order is (n, hi) with hi fastest, so the prefetch
    target is simply the next grid step's slab."""
    n = pl.program_id(0)
    hi = pl.program_id(1)
    n_h = pl.num_programs(1)
    slot = hi % 2

    def slab_dma(h_idx, s):
        return pltpu.make_async_copy(
            x_hbm.at[n, pl.ds(h_idx * tile_h, tile_h + 2), :, :],
            slab.at[s],
            sem.at[s],
        )

    @pl.when(hi == 0)
    def _():
        slab_dma(0, 0).start()

    @pl.when(hi + 1 < n_h)
    def _():
        slab_dma(hi + 1, (hi + 1) % 2).start()

    slab_dma(hi, slot).wait()

    acc = jnp.zeros((tile_h * W, Cout), jnp.float32)
    k = 0
    for dy in range(3):
        for dx in range(3):
            patch = slab[slot, dy:dy + tile_h, dx:dx + W, :].reshape(tile_h * W, Cin)
            acc = acc + jnp.dot(patch, w_ref[k], preferred_element_type=jnp.float32)
            k += 1
    out = acc + b_ref[0]
    if relu:
        out = jnp.maximum(out, 0.0)
    out_ref[0] = out.reshape(tile_h, W, Cout).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("tile_h", "relu", "interpret"))
def conv3x3_same_db(
    x: jax.Array,
    w3x3: jax.Array,
    b: jax.Array,
    tile_h: int = 16,
    relu: bool = True,
    interpret: bool | None = None,
) -> jax.Array:
    """Double-buffered variant of ``conv3x3_same_acc`` (same contract)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N, H, W, Cin = x.shape
    Cout = w3x3.shape[-1]
    assert H % tile_h == 0 and W % 8 == 0
    dtype = x.dtype
    sublane = {4: 8, 2: 16, 1: 32}[jnp.dtype(dtype).itemsize]
    w_total = W + 2
    w_align = (-w_total) % sublane
    c_align = (-Cin) % 128
    x_pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1 + w_align), (0, c_align)))
    w_k = (
        jnp.pad(w3x3, ((0, 0), (0, 0), (0, c_align), (0, 0)))
        .reshape(9, Cin + c_align, Cout)
        .astype(dtype)
    )
    Cin_p = Cin + c_align

    return pl.pallas_call(
        partial(_conv3x3_db_kernel, tile_h=tile_h, W=W, Cin=Cin_p, Cout=Cout, relu=relu),
        out_shape=jax.ShapeDtypeStruct((N, H, W, Cout), dtype),
        grid=(N, H // tile_h),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((9, Cin_p, Cout), lambda n, h: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda n, h: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, W, Cout), lambda n, h: (n, h, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, tile_h + 2, w_total + w_align, Cin_p), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * N * H * W * 9 * Cin_p * Cout,
            bytes_accessed=x.dtype.itemsize * (N * H * W * (Cin + Cout)),
            transcendentals=0,
        ),
    )(x_pad, w_k, b.astype(dtype)[None])
