"""Fused Pallas BiDAF attention kernel (SURVEY.md §3.2 row 2, §8 phase 6).

Fuses the whole block — trilinear similarity S, both masked softmaxes, the
C2Q and (product-form) Q2C weighted matmuls, and the ``[c; a; c∘a; c∘b]``
concat — into ONE kernel: S and both softmax tensors never round-trip to
HBM (the jnp version materializes three ``[B, T_c, T_q]`` intermediates).

Grid: one program per batch element; each program holds its ``[T_c, D]`` /
``[T_q, D]`` operands in VMEM (T ≲ 512, D = 2h ≲ 512 → well under the
16 MB/core VMEM budget; SURVEY §3.3 keeps the design blockwise-friendly for
a future tiled/ring variant).

Numerics match ``mmbidaf_tpu.ops.bidaf.bidaf_apply`` exactly (same -1e30
mask fill, same op order) — parity-tested in interpret mode on CPU and
compiled on TPU. Q2C is computed as ``s1 @ (s2ᵀ @ c)`` (two [T,D] GEMMs)
rather than ``(s1 @ s2ᵀ) @ c`` (a [T_c, T_c] intermediate).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _bidaf_kernel(c_ref, q_ref, cmask_ref, qmask_ref, wc_ref, wq_ref, wcq_ref,
                  bias_ref, out_ref):
    c = c_ref[0]          # [T_c, D]
    q = q_ref[0]          # [T_q, D]
    # Masks ship as [B, 1, T] so each program fetches only ITS (1, 1, T)
    # block (a 2-D (1, T) block would violate the (8, 128) tiling rule —
    # the extra unit axis makes the block's last-two-dims tile-aligned).
    c_mask = cmask_ref[0, 0]  # [T_c]
    q_mask = qmask_ref[0, 0]  # [T_q]
    w_c = wc_ref[0]        # [D]
    w_q = wq_ref[0]
    w_cq = wcq_ref[0]
    bias = bias_ref[0, 0]

    # Trilinear similarity.
    s0 = (c * w_c).sum(axis=-1, keepdims=True)                 # [T_c, 1]
    s1v = (q * w_q).sum(axis=-1, keepdims=True)                # [T_q, 1]
    s2 = jnp.dot(c * w_cq, q.T, preferred_element_type=jnp.float32)  # [T_c, T_q]
    S = s0 + s1v.T + s2 + bias

    # Masked softmaxes (same multiplicative form as ops.masked.mask_logits).
    qm = q_mask[None, :]
    cm = c_mask[:, None]
    S_row = qm * S + (1.0 - qm) * NEG_INF
    S_col = cm * S + (1.0 - cm) * NEG_INF
    s_row = jax.nn.softmax(S_row, axis=1)   # over T_q
    s_col = jax.nn.softmax(S_col, axis=0)   # over T_c

    a = jnp.dot(s_row, q, preferred_element_type=jnp.float32)           # [T_c, D]
    qc = jnp.dot(s_col.T, c, preferred_element_type=jnp.float32)        # [T_q, D]
    b = jnp.dot(s_row, qc, preferred_element_type=jnp.float32)          # [T_c, D]

    D = c.shape[-1]
    out_ref[0, :, 0 * D:1 * D] = c
    out_ref[0, :, 1 * D:2 * D] = a
    out_ref[0, :, 2 * D:3 * D] = c * a
    out_ref[0, :, 3 * D:4 * D] = c * b


@partial(jax.jit, static_argnames=("interpret",))
def bidaf_attention_fused(
    params: dict,
    c: jax.Array,
    q: jax.Array,
    c_mask: jax.Array,
    q_mask: jax.Array,
    interpret: bool | None = None,
) -> jax.Array:
    """Drop-in fused replacement for ``bidaf_apply`` (no dropout — inference
    path; training uses the jnp version whose VJP XLA fuses well).

    ``interpret=None`` auto-selects interpreter mode off-TPU so the same
    model code runs on the CPU test mesh and compiled on TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T_c, D = c.shape
    T_q = q.shape[1]
    f32 = jnp.float32

    grid_spec = pl.GridSpec(
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T_c, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T_q, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T_c), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T_q), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, T_c, 4 * D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
    )

    return pl.pallas_call(
        _bidaf_kernel,
        out_shape=jax.ShapeDtypeStruct((B, T_c, 4 * D), f32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (T_c * T_q * D * 3 + T_c * D),
            bytes_accessed=4 * B * (T_c * D * 5 + T_q * D * 2 + T_c * T_q),
            transcendentals=2 * B * T_c * T_q,
        ),
    )(
        c.astype(f32),
        q.astype(f32),
        c_mask.astype(f32)[:, None, :],
        q_mask.astype(f32)[:, None, :],
        params["w_c"].astype(f32)[None],
        params["w_q"].astype(f32)[None],
        params["w_cq"].astype(f32)[None],
        params["bias"].astype(f32).reshape(1, 1),
    )


# ---------------------------------------------------------------------------
# Trainable wrapper: the no-dropout training path is the dropout kernel's
# cd=c, qd=q special case (one kernel pair to maintain; the grad identity
# d_c_total = d_c_direct + d_cd holds exactly). Replaces the round-1
# remat-jnp VJP, whose XLA backward materialized three [B, T_c, T_q]
# tensors in HBM.
# ---------------------------------------------------------------------------


def bidaf_attention_fused_trainable(params, c, q, c_mask, q_mask):
    """Fused forward+backward BiDAF for the dropout-free training path."""
    return bidaf_attention_fused_dropout(params, c, q, c, q, c_mask, q_mask)


# ---------------------------------------------------------------------------
# Dropout-training variant. Reference semantics (ops/bidaf.py): dropout hits
# c and q ONLY inside the similarity products — the attention outputs
# a = s_row·q, qc = s_colᵀ·c and the [c; a; c∘a; c∘b] concat use the
# UNDROPPED tensors. So the kernels take (c, q) and (cd, qd) separately;
# the dropout masks themselves are applied OUTSIDE in jnp (cd = c·m/keep),
# and autodiff composes d_c_total = d_c_direct + d_cd·m/keep through the
# custom VJP below. This extends the fused training path to the default
# drop_prob=0.2 configuration.
# ---------------------------------------------------------------------------


def _bidaf_drop_kernel(c_ref, q_ref, cd_ref, qd_ref, cmask_ref, qmask_ref,
                       wc_ref, wq_ref, wcq_ref, bias_ref, out_ref):
    c = c_ref[0]
    q = q_ref[0]
    cd = cd_ref[0]
    qd = qd_ref[0]
    c_mask = cmask_ref[0, 0]
    q_mask = qmask_ref[0, 0]
    w_c = wc_ref[0]
    w_q = wq_ref[0]
    w_cq = wcq_ref[0]
    bias = bias_ref[0, 0]

    # Similarity from the DROPPED operands.
    s0 = (cd * w_c).sum(axis=-1, keepdims=True)
    s1v = (qd * w_q).sum(axis=-1, keepdims=True)
    S = s0 + s1v.T + jnp.dot(cd * w_cq, qd.T, preferred_element_type=jnp.float32) + bias

    qm = q_mask[None, :]
    cm = c_mask[:, None]
    s_row = jax.nn.softmax(qm * S + (1.0 - qm) * NEG_INF, axis=1)
    s_col = jax.nn.softmax(cm * S + (1.0 - cm) * NEG_INF, axis=0)

    # Outputs from the UNDROPPED operands.
    a = jnp.dot(s_row, q, preferred_element_type=jnp.float32)
    qc = jnp.dot(s_col.T, c, preferred_element_type=jnp.float32)
    b = jnp.dot(s_row, qc, preferred_element_type=jnp.float32)

    D = c.shape[-1]
    out_ref[0, :, 0 * D:1 * D] = c
    out_ref[0, :, 1 * D:2 * D] = a
    out_ref[0, :, 2 * D:3 * D] = c * a
    out_ref[0, :, 3 * D:4 * D] = c * b


def _bidaf_drop_bwd_kernel(c_ref, q_ref, cd_ref, qd_ref, cmask_ref, qmask_ref,
                           wc_ref, wq_ref, wcq_ref, bias_ref, g_ref,
                           dc_ref, dq_ref, dcd_ref, dqd_ref,
                           dwc_ref, dwq_ref, dwcq_ref, dbias_ref):
    b_idx = pl.program_id(0)
    c = c_ref[0]
    q = q_ref[0]
    cd = cd_ref[0]
    qd = qd_ref[0]
    c_mask = cmask_ref[0, 0]
    q_mask = qmask_ref[0, 0]
    w_c = wc_ref[0]
    w_q = wq_ref[0]
    w_cq = wcq_ref[0]
    bias = bias_ref[0, 0]
    D = c.shape[-1]
    dot = partial(jnp.dot, preferred_element_type=jnp.float32)

    # --- recompute the forward ---
    s0 = (cd * w_c).sum(axis=-1, keepdims=True)
    s1v = (qd * w_q).sum(axis=-1, keepdims=True)
    cw = cd * w_cq
    S = s0 + s1v.T + dot(cw, qd.T) + bias
    qm = q_mask[None, :]
    cm = c_mask[:, None]
    s_row = jax.nn.softmax(qm * S + (1.0 - qm) * NEG_INF, axis=1)
    s_col = jax.nn.softmax(cm * S + (1.0 - cm) * NEG_INF, axis=0)
    a = dot(s_row, q)
    qc = dot(s_col.T, c)
    b = dot(s_row, qc)

    g0 = g_ref[0, :, 0 * D:1 * D]
    g1 = g_ref[0, :, 1 * D:2 * D]
    g2 = g_ref[0, :, 2 * D:3 * D]
    g3 = g_ref[0, :, 3 * D:4 * D]
    # direct (undropped) paths
    d_c = g0 + g2 * a + g3 * b
    d_a = g1 + g2 * c
    d_b = g3 * c

    d_s_row = dot(d_b, qc.T) + dot(d_a, q.T)
    d_qc = dot(s_row.T, d_b)
    d_s_col = dot(c, d_qc.T)
    d_c = d_c + dot(s_col, d_qc)
    d_q = dot(s_row.T, d_a)

    dS = qm * (s_row * (d_s_row - (d_s_row * s_row).sum(axis=1, keepdims=True)))
    dS = dS + cm * (s_col * (d_s_col - (d_s_col * s_col).sum(axis=0, keepdims=True)))

    # similarity (dropped) paths
    d_s0 = dS.sum(axis=1, keepdims=True)
    d_s1 = dS.sum(axis=0, keepdims=True)
    dSq = dot(dS, qd)
    d_cd = d_s0 * w_c[None, :] + dSq * w_cq[None, :]
    d_qd = d_s1.T * w_q[None, :] + dot(dS.T, cw)

    dc_ref[0] = d_c
    dq_ref[0] = d_q
    dcd_ref[0] = d_cd
    dqd_ref[0] = d_qd

    p_wc = (cd * d_s0).sum(axis=0, keepdims=True)
    p_wq = (qd * d_s1.T).sum(axis=0, keepdims=True)
    p_wcq = (dSq * cd).sum(axis=0, keepdims=True)
    p_bias = dS.sum()

    @pl.when(b_idx == 0)
    def _():
        dwc_ref[:] = p_wc
        dwq_ref[:] = p_wq
        dwcq_ref[:] = p_wcq
        dbias_ref[0, 0] = p_bias

    @pl.when(b_idx > 0)
    def _():
        dwc_ref[:] += p_wc
        dwq_ref[:] += p_wq
        dwcq_ref[:] += p_wcq
        dbias_ref[0, 0] += p_bias


def _drop_specs(T_c, T_q, D):
    seq = lambda T: pl.BlockSpec((1, T, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, D), lambda b: (0, 0), memory_space=pltpu.VMEM)
    return [
        seq(T_c), seq(T_q), seq(T_c), seq(T_q),
        pl.BlockSpec((1, 1, T_c), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, T_q), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        vec, vec, vec,
        pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
    ]


def _drop_operands(params, c, q, cd, qd, c_mask, q_mask):
    f32 = jnp.float32
    return (
        c.astype(f32), q.astype(f32), cd.astype(f32), qd.astype(f32),
        c_mask.astype(f32)[:, None, :], q_mask.astype(f32)[:, None, :],
        params["w_c"].astype(f32)[None], params["w_q"].astype(f32)[None],
        params["w_cq"].astype(f32)[None], params["bias"].astype(f32).reshape(1, 1),
    )


@jax.custom_vjp
def bidaf_attention_fused_dropout(params, c, q, cd, qd, c_mask, q_mask):
    """Fused BiDAF with similarity-only dropout operands (``cd``/``qd``)."""
    interpret = jax.default_backend() != "tpu"
    B, T_c, D = c.shape
    T_q = q.shape[1]
    grid_spec = pl.GridSpec(
        grid=(B,),
        in_specs=_drop_specs(T_c, T_q, D),
        out_specs=pl.BlockSpec((1, T_c, 4 * D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _bidaf_drop_kernel,
        out_shape=jax.ShapeDtypeStruct((B, T_c, 4 * D), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*_drop_operands(params, c, q, cd, qd, c_mask, q_mask))


def _drop_fwd(params, c, q, cd, qd, c_mask, q_mask):
    out = bidaf_attention_fused_dropout(params, c, q, cd, qd, c_mask, q_mask)
    return out, (params, c, q, cd, qd, c_mask, q_mask)


def _drop_bwd(res, g):
    params, c, q, cd, qd, c_mask, q_mask = res
    interpret = jax.default_backend() != "tpu"
    B, T_c, D = c.shape
    T_q = q.shape[1]
    f32 = jnp.float32
    seq_out = lambda T: pl.BlockSpec((1, T, D), lambda b: (b, 0, 0),
                                     memory_space=pltpu.VMEM)
    vec_out = pl.BlockSpec((1, D), lambda b: (0, 0), memory_space=pltpu.VMEM)
    grid_spec = pl.GridSpec(
        grid=(B,),
        in_specs=_drop_specs(T_c, T_q, D) + [
            pl.BlockSpec((1, T_c, 4 * D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            seq_out(T_c), seq_out(T_q), seq_out(T_c), seq_out(T_q),
            vec_out, vec_out, vec_out,
            pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
        ],
    )
    d_c, d_q, d_cd, d_qd, d_wc, d_wq, d_wcq, d_bias = pl.pallas_call(
        _bidaf_drop_bwd_kernel,
        out_shape=[
            jax.ShapeDtypeStruct((B, T_c, D), f32),
            jax.ShapeDtypeStruct((B, T_q, D), f32),
            jax.ShapeDtypeStruct((B, T_c, D), f32),
            jax.ShapeDtypeStruct((B, T_q, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((1, 1), f32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(*_drop_operands(params, c, q, cd, qd, c_mask, q_mask), g.astype(f32))
    d_params = {
        "w_c": d_wc[0].astype(params["w_c"].dtype),
        "w_q": d_wq[0].astype(params["w_q"].dtype),
        "w_cq": d_wcq[0].astype(params["w_cq"].dtype),
        "bias": d_bias[0, 0].reshape(params["bias"].shape).astype(params["bias"].dtype),
    }
    return (d_params, d_c.astype(c.dtype), d_q.astype(q.dtype),
            d_cd.astype(cd.dtype), d_qd.astype(qd.dtype), None, None)


bidaf_attention_fused_dropout.defvjp(_drop_fwd, _drop_bwd)
