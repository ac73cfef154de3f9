"""Fused Pallas Winograd F(2x2,3x3) conv kernel (round-2 conv attack).

Why a kernel: Winograd cuts 3x3-conv MACs 2.25x, but at the XLA level the
4x tile blow-up must be materialized in HBM and the transform passes can't
fuse into the GEMMs — measured 5-90x SLOWER than XLA's direct conv
(docs/KERNELS.md). Here the whole algorithm runs per grid block in VMEM:
HBM traffic is one read of the (space-to-depth) input and one write of the
(tile-layout) output — the same traffic as direct conv, at 0.44x the MXU
work. That is the speed-of-light formulation for MXU-bound layers.

Layout strategy (Mosaic rules from round 1: no strided sublane access, no
value dynamic_slice, lane slices at 128-multiples):

- The caller space-to-depths the padded input ONCE in XLA:
  ``X2[n, ah, aw, (2p+q)·C + c] = xp[n, 2·ah + p, 2·aw + q, c]`` — after
  which every Winograd tile element d(i, j) of tile (h, w) is the
  CONTIGUOUS slice ``X2[h + i//2, w + j//2, group(i%2, j%2)]``.
- Inside the kernel, Bᵀ(·)B is 8 row-combo slabs + per-point column
  combos — all ±adds of contiguous slices (B's entries are ±1/0).
- Per transform point (16): one clean ``[nh·nw, C] @ [C, Kblk]`` MXU GEMM
  with f32 accumulation against the resident transformed weights U.
- Aᵀ(·)A folds each GEMM result into four f32 accumulators with ±1
  coefficients; bias+ReLU fuse into the output write.
- Output leaves in 2x2-tile (s2d) layout ``[n, nh, nw, 4K]``; the caller
  un-s2ds in XLA (one fused transpose-reshape).

Tile counts are padded so nw is a 16-multiple (bf16 sublane tile) — padded
tiles compute on zeros and are cropped by the caller.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mmbidaf_tpu.ops.winograd import transform_weights

# Aᵀ rows of F(2x2,3x3): y0 = m0+m1+m2 ; y1 = m1-m2-m3.
_AT = ((1, 1, 1, 0), (0, 1, -1, -1))


def _wino_kernel(x2_ref, u_ref, b_ref, out_ref, *, nh, nw, C, Kblk, relu):
    x2 = x2_ref[0]  # [nh+1, nw+1, 4C]
    cd = x2.dtype

    def grp(p, q):
        g = 2 * p + q
        return x2[:, :, g * C:(g + 1) * C]

    # Bᵀ along rows: T[a][q] (8 slabs, contiguous row slices, ±adds).
    def rows(pq, lo):  # lo=0 → tile rows h, lo=1 → rows h+1
        return grp(*pq)[lo:lo + nh, :, :]

    T = [[None, None] for _ in range(4)]
    for q in (0, 1):
        t0 = rows((0, q), 0)
        t1 = rows((1, q), 0)
        b0 = rows((0, q), 1)
        b1 = rows((1, q), 1)
        T[0][q] = t0 - b0
        T[1][q] = t1 + b0
        T[2][q] = b0 - t1
        T[3][q] = t1 - b1

    # Per transform point: column combo → GEMM → Aᵀ(·)A accumulate.
    flat = nh * nw
    acc = [[jnp.zeros((flat, Kblk), jnp.float32) for _ in range(2)] for _ in range(2)]
    for a in range(4):
        lq = {q: T[a][q][:, 0:nw, :] for q in (0, 1)}
        rq = {q: T[a][q][:, 1:nw + 1, :] for q in (0, 1)}
        V = [
            lq[0] - rq[0],
            lq[1] + rq[0],
            rq[0] - lq[1],
            lq[1] - rq[1],
        ]
        for b in range(4):
            m = jnp.dot(
                V[b].reshape(flat, C).astype(cd),
                u_ref[a * 4 + b],
                preferred_element_type=jnp.float32,
            )
            for y0 in (0, 1):
                ca = _AT[y0][a]
                if ca == 0:
                    continue
                for y1 in (0, 1):
                    coef = ca * _AT[y1][b]
                    if coef == 1:
                        acc[y0][y1] = acc[y0][y1] + m
                    elif coef == -1:
                        acc[y0][y1] = acc[y0][y1] - m

    bias = b_ref[0].astype(jnp.float32)
    for y0 in (0, 1):
        for y1 in (0, 1):
            y = acc[y0][y1] + bias
            if relu:
                y = jnp.maximum(y, 0.0)
            g = 2 * y0 + y1
            out_ref[0, :, :, g * Kblk:(g + 1) * Kblk] = (
                y.reshape(nh, nw, Kblk).astype(out_ref.dtype)
            )


@partial(jax.jit, static_argnames=("relu", "k_block", "interpret"))
def winograd_conv3x3_fused(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    relu: bool = False,
    k_block: int = 128,
    interpret: bool | None = None,
) -> jax.Array:
    """3x3/stride-1/SAME conv (+bias+ReLU) via the fused Winograd kernel.

    ``x [N, H, W, C]``, ``w [3, 3, C, K]`` → ``[N, H, W, K]``. C and the
    K block must be 128-multiples (VGG layers conv3_1+ qualify; shallower
    layers stay on XLA's direct conv — they are memory-bound and Winograd
    loses there anyway).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N, H, W, C = x.shape
    K = w.shape[-1]
    assert C % 128 == 0, f"C_in {C} must be a 128-multiple"
    Kblk = min(k_block, K)
    assert K % Kblk == 0 and Kblk % 128 == 0
    dtype = x.dtype

    # Tile geometry: nh = ceil(H/2); nw padded to a 16-multiple (bf16
    # sublane tile) — padded tiles are zeros, cropped after un-s2d.
    nh = -(-H // 2)
    nw = (-(-W // 2) + 15) // 16 * 16
    rows = 2 * (nh + 1)
    cols = 2 * (nw + 1)
    xp = jnp.pad(x, ((0, 0), (1, rows - H - 1), (1, cols - W - 1), (0, 0)))

    # Space-to-depth: X2[n, ah, aw, (2p+q)C + c] = xp[n, 2ah+p, 2aw+q, c].
    X2 = (
        xp.reshape(N, nh + 1, 2, nw + 1, 2, C)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(N, nh + 1, nw + 1, 4 * C)
    )

    # Transformed weights, flattened to [16, C, K] (f32 → compute dtype).
    U_nested = transform_weights(w)
    U = jnp.stack([U_nested[a][b] for a in range(4) for b in range(4)])
    U = U.astype(dtype)
    bias = (b if b is not None else jnp.zeros((K,), jnp.float32))
    bias = bias.astype(jnp.float32).reshape(1, K)  # 2D: 1-D f32 operands hit
    # Mosaic's T(512) layout rule when K-blocked below 512

    n_kb = K // Kblk
    grid_spec = pl.GridSpec(
        grid=(N, n_kb),
        in_specs=[
            pl.BlockSpec((1, nh + 1, nw + 1, 4 * C), lambda n, kb: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, C, Kblk), lambda n, kb: (0, 0, kb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Kblk), lambda n, kb: (0, kb), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nh, nw, 4 * Kblk), lambda n, kb: (n, 0, 0, kb),
                               memory_space=pltpu.VMEM),
    )
    useful_flops = 2.0 * N * H * W * C * K * 9
    Y2 = pl.pallas_call(
        partial(_wino_kernel, nh=nh, nw=nw, C=C, Kblk=Kblk, relu=relu),
        out_shape=jax.ShapeDtypeStruct((N, nh, nw, 4 * K), dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(useful_flops * 16 / 36),
            bytes_accessed=int(X2.size * X2.dtype.itemsize * 1.0
                               + N * nh * nw * 4 * K * 2),
            transcendentals=0,
        ),
    )(X2, U, bias)

    # Un-s2d. K-blocked writes leave channel order (kb, 2y0+y1, k_local):
    # view [N, nh, nw, n_kb, y0, y1, Kblk] → [N, 2nh, 2nw, K] → crop.
    y = (
        Y2.reshape(N, nh, nw, n_kb, 2, 2, Kblk)
        .transpose(0, 1, 4, 2, 5, 3, 6)
        .reshape(N, 2 * nh, 2 * nw, K)
    )
    return y[:, :H, :W, :]
