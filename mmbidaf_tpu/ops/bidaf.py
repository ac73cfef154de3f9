"""BiDAF attention (SURVEY.md §9 "BiDAF similarity", starter form).

For context ``c ∈ [B, T_c, 2h]`` and query ``q ∈ [B, T_q, 2h]``:

    S = c·w_c·1ᵀ + 1·(q·w_q)ᵀ + (c∘w_cq)·qᵀ + b          (trilinear)
    s1 = softmax_row(S masked by q_mask)   # over T_q
    s2 = softmax_col(S masked by c_mask)   # over T_c
    a  = s1·q                              # context-to-query (C2Q)
    b_ = s1·s2ᵀ·c                          # query-to-context (Q2C, product/DCN form)
    G  = [c; a; c∘a; c∘b_] ∈ [B, T_c, 8h]

Dropout is applied to c and q *before* the similarity products (parity with
the reference). The whole block is three batched GEMMs plus pointwise — XLA
fuses the masking/softmax into the matmul epilogues; a fused Pallas kernel
version lives in ``mmbidaf_tpu.ops.pallas.bidaf_kernel`` behind
``ModelConfig.use_pallas_attention``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mmbidaf_tpu.ops.masked import masked_softmax


def bidaf_init(key: jax.Array, dim: int, dtype=jnp.float32) -> dict:
    """``dim`` is the per-sequence feature size (2h in the reference)."""
    k1, k2, k3 = jax.random.split(key, 3)

    def xavier_vec(k):
        # torch starter uses xavier_uniform_ on [dim, 1] weights.
        bound = jnp.sqrt(6.0 / (dim + 1))
        return jax.random.uniform(k, (dim,), dtype, -bound, bound)

    return {
        "w_c": xavier_vec(k1),
        "w_q": xavier_vec(k2),
        "w_cq": xavier_vec(k3),
        "bias": jnp.zeros((), dtype),
    }


def similarity_matrix(
    params: dict,
    c: jax.Array,
    q: jax.Array,
    drop_prob: float = 0.0,
    rng: jax.Array | None = None,
) -> jax.Array:
    """Trilinear similarity ``S [B, T_c, T_q]``; dropout on c, q first."""
    if drop_prob > 0.0 and rng is not None:
        rc, rq = jax.random.split(rng)
        keep = 1.0 - drop_prob
        c = c * jax.random.bernoulli(rc, keep, c.shape) / keep
        q = q * jax.random.bernoulli(rq, keep, q.shape) / keep
    s0 = (c @ params["w_c"])[:, :, None]             # [B, T_c, 1]
    s1 = (q @ params["w_q"])[:, None, :]             # [B, 1, T_q]
    s2 = jnp.einsum("bcd,bqd->bcq", c * params["w_cq"], q)
    return s0 + s1 + s2 + params["bias"]


def bidaf_apply(
    params: dict,
    c: jax.Array,
    q: jax.Array,
    c_mask: jax.Array,
    q_mask: jax.Array,
    drop_prob: float = 0.0,
    rng: jax.Array | None = None,
) -> jax.Array:
    """Full BiDAF block → ``G [B, T_c, 8h]``."""
    S = similarity_matrix(params, c, q, drop_prob, rng)  # [B, T_c, T_q]
    s_row = masked_softmax(S, q_mask[:, None, :], axis=2)  # softmax over T_q
    s_col = masked_softmax(S, c_mask[:, :, None], axis=1)  # softmax over T_c
    a = jnp.einsum("bcq,bqd->bcd", s_row, q)               # C2Q
    b = jnp.einsum("bcq,bkq,bkd->bcd", s_row, s_col, c)    # Q2C (product form)
    return jnp.concatenate([c, a, c * a, c * b], axis=-1)
