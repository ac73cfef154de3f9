"""Winograd F(2x2, 3x3) convolution (round-2 conv attack, SURVEY.md §3.2).

The VGG stack is all 3x3/stride-1/SAME convs — the exact shape Winograd's
minimal-filtering algorithm accelerates: each 2x2 output tile costs 16
multiplies instead of 36 (2.25x fewer MACs). XLA:TPU lowers convs to
direct MXU passes and never applies Winograd, so on MXU-bound layers this
is FLOP reduction the compiler can't recover:

    Y = Aᵀ [ (G g Gᵀ) ⊙ (Bᵀ d B) ] A        per 4x4 input tile d,
                                             summed over C_in inside the ⊙

Layout rules learned on-chip (the first einsum-based draft ran 10-90x
SLOWER than XLA's conv): keep channels on the lane axis end to end, never
materialize the [4, 4, ...] tile tensor, and express the B/A transforms as
what they are — ±1/0 ADDS of stride-2 slices (fused by XLA into the V
writes) — so the only materialized intermediates are the 16 transform-
point operands, each consumed by its own plain [tiles, C] @ [C, K] GEMM.

The 4x tile blow-up makes shallow, memory-bound layers (224²/112², C≤128)
LOSE to direct conv; deep MXU-bound layers (C_in ≥ 256 here) win on the
2.25x MAC cut. ``vgg_features(winograd=True)`` applies exactly that split.

Numerics: transforms accumulate in f32, GEMMs run in the input dtype with
f32 accumulation; bf16 feature error vs ``lax.conv`` ~1e-2 relative
(parity-tested) — fine for the frozen featurizer; exact XLA conv stays the
default.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def transform_weights(w: jax.Array) -> list[list[jax.Array]]:
    """``[3, 3, C, K]`` → 4x4 nested list of ``[C, K]``: U = G g Gᵀ (f32).

    G rows: (g0, (g0+g1+g2)/2, (g0-g1+g2)/2, g2) — applied to both kernel
    axes. Kept as separate per-point matrices so each feeds its own GEMM.
    """
    w = w.astype(jnp.float32)
    rows = [w[0], (w[0] + w[1] + w[2]) * 0.5, (w[0] - w[1] + w[2]) * 0.5, w[2]]
    U = []
    for r in rows:  # r: [3, C, K]
        U.append([r[0], (r[0] + r[1] + r[2]) * 0.5, (r[0] - r[1] + r[2]) * 0.5, r[2]])
    return U


def winograd_conv3x3(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
) -> jax.Array:
    """3x3/stride-1/SAME conv via Winograd F(2x2, 3x3).

    ``x [N, H, W, C]``, ``w [3, 3, C, K]`` → ``[N, H, W, K]``.
    """
    N, H, W, C = x.shape
    K = w.shape[-1]
    dtype = x.dtype
    U = transform_weights(w)

    # SAME halo (1 px) + pad H/W to even for whole 2x2 output tiles.
    Hp = -H % 2
    Wp = -W % 2
    xp = jnp.pad(x, ((0, 0), (1, 1 + Hp), (1, 1 + Wp), (0, 0))).astype(jnp.float32)
    nh = (H + Hp) // 2
    nw = (W + Wp) // 2

    # d(i, j): the (i, j)-th element of every 4x4 stride-2 tile — a strided
    # slice, not a gather. Channels stay on lanes throughout.
    def d(i, j):
        return xp[:, i:i + 2 * nh:2, j:j + 2 * nw:2, :]

    # Bᵀ rows: (d0 - d2, d1 + d2, d2 - d1, d1 - d3) along each axis. Build
    # the 16 V operands as fused adds of 4 strided reads each.
    def bt(f, j0):
        return [f(0, j0) - f(2, j0), f(1, j0) + f(2, j0),
                f(2, j0) - f(1, j0), f(1, j0) - f(3, j0)]

    rows = [bt(lambda jq, j0=i0: d(i0, jq), None) for i0 in range(4)]
    # rows[i][a] applied Bᵀ along W; now along H:
    M = [[None] * 4 for _ in range(4)]
    flat = N * nh * nw
    for a in range(4):
        col = [rows[i][a] for i in range(4)]
        V_a = [col[0] - col[2], col[1] + col[2], col[2] - col[1], col[1] - col[3]]
        for bidx in range(4):
            v = V_a[bidx].astype(dtype).reshape(flat, C)
            M[bidx][a] = jnp.dot(
                v, U[bidx][a].astype(dtype), preferred_element_type=jnp.float32
            )  # [flat, K] — one clean MXU GEMM per transform point

    # Y = Aᵀ M A; Aᵀ rows: (m0 + m1 + m2, m1 - m2 - m3).
    def at(ms):
        return [ms[0] + ms[1] + ms[2], ms[1] - ms[2] - ms[3]]

    P = [at(M[i]) for i in range(4)]          # P[i][y] — A applied along W
    Y = [[None] * 2 for _ in range(2)]
    for ycol in range(2):
        col = [P[i][ycol] for i in range(4)]
        Y[0][ycol] = col[0] + col[1] + col[2]
        Y[1][ycol] = col[1] - col[2] - col[3]

    # Reassemble 2x2 output tiles → [N, 2nh, 2nw, K].
    out = jnp.stack(
        [jnp.stack([Y[0][0], Y[0][1]], axis=-2),
         jnp.stack([Y[1][0], Y[1][1]], axis=-2)], axis=-3,
    )  # [flat, 2, 2, K]
    out = out.reshape(N, nh, nw, 2, 2, K).transpose(0, 1, 3, 2, 4, 5)
    out = out.reshape(N, 2 * nh, 2 * nw, K)[:, :H, :W, :]
    if b is not None:
        out = out + b
    return out.astype(dtype)
