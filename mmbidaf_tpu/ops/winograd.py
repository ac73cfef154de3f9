"""Winograd F(2x2, 3x3) convolution (round-2 conv attack, SURVEY.md §3.2).

The VGG stack is all 3x3/stride-1/SAME convs — the exact shape Winograd's
minimal-filtering algorithm accelerates: each 2x2 output tile costs 16
multiplies instead of 36 (2.25x fewer MACs). XLA:TPU lowers convs to
direct MXU passes and never applies Winograd, so when the conv stack is
MXU-bound this is FLOP reduction the compiler can't give us:

    Y = Aᵀ [ (G g Gᵀ) ⊙ (Bᵀ d B) ] A        per 4x4 input tile d,
                                             summed over C_in inside the ⊙

The ⊙ across channels is, per transform point (16 of them), a plain GEMM
``[N·(H/2)·(W/2), C_in] @ [C_in, C_out]`` — ideal MXU work at VGG widths.
The B/A transforms are ±1/0 adds (VPU); G is applied to the (frozen)
weights once. Numerics: transforms accumulate in f32; the 16 GEMMs run in
the compute dtype (bf16 on TPU) with f32 accumulation. Max error vs
``lax.conv`` is ~1e-2 relative in bf16 (parity-tested), fine for frozen
VGG features; the exact XLA conv stays the default (config flag).

Memory: the tiled operand is 4x the input, so the batch axis is processed
in chunks via ``lax.map`` (chunk size caps live VMEM/HBM footprint).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# F(2x2, 3x3) transform matrices (Lavin & Gray 2015).
_BT = np.array(
    [[1, 0, -1, 0],
     [0, 1, 1, 0],
     [0, -1, 1, 0],
     [0, 1, 0, -1]], np.float32)
_G = np.array(
    [[1, 0, 0],
     [0.5, 0.5, 0.5],
     [0.5, -0.5, 0.5],
     [0, 0, 1]], np.float32)
_AT = np.array(
    [[1, 1, 1, 0],
     [0, 1, -1, -1]], np.float32)


def transform_weights(w: jax.Array) -> jax.Array:
    """``[3, 3, C, K] → [4, 4, C, K]``: U = G g Gᵀ (once, f32)."""
    G = jnp.asarray(_G)
    return jnp.einsum("ai,bj,ijck->abck", G, G, w.astype(jnp.float32))


def _winograd_chunk(x: jax.Array, U: jax.Array, nh: int, nw: int,
                    compute_dtype) -> jax.Array:
    """One padded chunk ``[n, 2nh+2, 2nw+2, C] → [n, 2nh, 2nw, K]``."""
    n, _, _, C = x.shape
    K = U.shape[-1]
    Bt = jnp.asarray(_BT)
    At = jnp.asarray(_AT)

    # 4x4 input tiles at stride 2: d[i, j] = x[:, i::2 (nh), j::2 (nw), :]
    rows = [x[:, dy:dy + 2 * nh:2, :, :] for dy in range(4)]
    d = jnp.stack(
        [jnp.stack([r[:, :, dx:dx + 2 * nw:2, :] for dx in range(4)], axis=0)
         for r in rows], axis=0)                        # [4, 4, n, nh, nw, C]

    # V = Bᵀ d B — pure ±1 adds, f32 accumulation.
    V = jnp.einsum("ai,bj,ijnhwc->abnhwc", Bt, Bt, d.astype(jnp.float32))

    # 16 batched GEMMs on the MXU: [n·nh·nw, C] @ [C, K] per point.
    Vm = V.reshape(16, n * nh * nw, C).astype(compute_dtype)
    Um = U.reshape(16, C, K).astype(compute_dtype)
    M = jax.lax.dot_general(
        Vm, Um,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).reshape(4, 4, n, nh, nw, K)

    # Y = Aᵀ M A → 2x2 output tiles, reassembled to [n, 2nh, 2nw, K].
    Y = jnp.einsum("ai,bj,ijnhwk->nhawbk", At, At, M)   # [n, nh, 2, nw, 2, K]
    return Y.reshape(n, 2 * nh, 2 * nw, K)


@partial(jax.jit, static_argnames=("chunk",))
def winograd_conv3x3(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    chunk: int = 32,
) -> jax.Array:
    """3x3/stride-1/SAME conv via Winograd F(2x2, 3x3).

    ``x [N, H, W, C]``, ``w [3, 3, C, K]`` → ``[N, H, W, K]``; batch is
    processed in ``chunk``-image slabs (the tiled operand is 4x the input).
    """
    N, H, W, C = x.shape
    compute_dtype = x.dtype
    U = transform_weights(w)

    # SAME halo (1 px) + pad H/W to even for whole 2x2 output tiles.
    Hp = -H % 2
    Wp = -W % 2
    xp = jnp.pad(x, ((0, 0), (1, 1 + Hp), (1, 1 + Wp), (0, 0)))
    nh = (H + Hp) // 2
    nw = (W + Wp) // 2

    chunk = min(chunk, N)
    if N % chunk:
        # wrap-pad the batch to a chunk multiple (sliced off below)
        pad_n = chunk - N % chunk
        xp = jnp.concatenate([xp, xp[:pad_n]], axis=0)
    xc = xp.reshape(-1, chunk, *xp.shape[1:])

    y = jax.lax.map(
        lambda t: _winograd_chunk(t, U, nh, nw, compute_dtype), xc
    )
    y = y.reshape(-1, 2 * nh, 2 * nw, w.shape[-1])[:N, :H, :W, :]
    if b is not None:
        y = y + b
    return y.astype(compute_dtype)
