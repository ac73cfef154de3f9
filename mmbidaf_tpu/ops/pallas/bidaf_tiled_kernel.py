"""Tiled/blockwise BiDAF attention kernel (SURVEY.md §3.3 "ring-ready").

The batch-grid kernel in ``bidaf_kernel.py`` holds whole ``[T_c, T_q]``
tiles in VMEM — fine at this model's sizes. This variant tiles BOTH sequence
axes so VMEM holds only ``[Tc_blk, D]``/``[Tq_blk, D]`` blocks, the shape a
ring/multi-chip schedule needs (each step would stream a remote q-block
instead of a local one). Two passes:

  pass 1 (stats): stream q-blocks per c-block, keeping flash-style running
    row-max/denominator for the row softmax (over T_q), and accumulate
    column-max/denominator for the column softmax (over T_c) plus the
    unnormalized ``s_colᵀ·c`` partial — the only cross-c-tile quantities.
  pass 2 (outputs): re-stream q-blocks, form normalized s_row blocks, and
    accumulate ``a = s_row·q`` and ``b = s_row·(s_colᵀ·c / denom)``.

Implemented as jnp block-loops orchestrating a Pallas inner kernel would
double-compile; instead the whole two-pass schedule runs in ONE kernel with
a 1-D grid over batch and ``lax.fori_loop`` over blocks (TPU grids are
sequential anyway, and the block loops keep VMEM usage to O(blk·D)).

Parity: identical results to ``bidaf_apply`` (same -1e30 masking, fp32
accumulation) — tested in interpret mode.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _tiled_kernel(c_hbm, q_hbm, cmask_ref, qmask_ref, wc_ref, wq_ref, wcq_ref,
                  bias_ref, out_ref, *, tc_blk: int, tq_blk: int):
    """One batch element; block-streamed two-pass BiDAF."""
    b_idx = pl.program_id(0)
    T_c = c_hbm.shape[1]
    T_q = q_hbm.shape[1]
    D = c_hbm.shape[2]
    n_cb = T_c // tc_blk
    n_qb = T_q // tq_blk

    w_c = wc_ref[0]
    w_q = wq_ref[0]
    w_cq = wcq_ref[0]
    bias = bias_ref[0, 0]
    c_mask = cmask_ref[b_idx, :]   # [T_c]
    q_mask = qmask_ref[b_idx, :]   # [T_q]

    def s_block(ci, qi):
        """Similarity block [tc_blk, tq_blk] for (c-block ci, q-block qi)."""
        c_blk = c_hbm[0, ci * tc_blk:(ci + 1) * tc_blk, :]
        q_blk = q_hbm[0, qi * tq_blk:(qi + 1) * tq_blk, :]
        s0 = (c_blk * w_c).sum(axis=-1, keepdims=True)
        s1 = (q_blk * w_q).sum(axis=-1, keepdims=True)
        s2 = jnp.dot(c_blk * w_cq, q_blk.T, preferred_element_type=jnp.float32)
        return s0 + s1.T + s2 + bias, c_blk, q_blk

    def masked_rowwise(S, ci, qi):
        qm = q_mask[qi * tq_blk:(qi + 1) * tq_blk][None, :]
        return qm * S + (1.0 - qm) * NEG_INF

    def masked_colwise(S, ci, qi):
        cm = c_mask[ci * tc_blk:(ci + 1) * tc_blk][:, None]
        return cm * S + (1.0 - cm) * NEG_INF

    # Block loops are Python-unrolled: n_cb/n_qb are STATIC, and Pallas TPU
    # cannot lower dynamic_slice on values — static slices lower fine. The
    # per-q-block column stats live in a Python list (one value per block).
    # ---- pass 1: column-softmax stats + normalized s_colᵀ·c per q-block ----
    qc_blocks = []
    for qi in range(n_qb):
        cmax = jnp.full((tq_blk,), NEG_INF, jnp.float32)
        cden = jnp.zeros((tq_blk,), jnp.float32)
        qc = jnp.zeros((tq_blk, D), jnp.float32)
        for ci in range(n_cb):
            S, c_blk, _ = s_block(ci, qi)
            Sc = masked_colwise(S, ci, qi)  # masked over c rows
            blk_max = Sc.max(axis=0)        # [tq_blk]
            new_max = jnp.maximum(cmax, blk_max)
            scale = jnp.exp(cmax - new_max)
            p = jnp.exp(Sc - new_max[None, :])         # [tc_blk, tq_blk]
            cden = cden * scale + p.sum(axis=0)
            qc = qc * scale[:, None] + jnp.dot(
                p.T, c_blk, preferred_element_type=jnp.float32
            )
            cmax = new_max
        qc_blocks.append(qc / jnp.maximum(cden, 1e-30)[:, None])

    # ---- pass 2: flash row softmax; accumulate a and b per c-block ----
    for ci in range(n_cb):
        rmax = jnp.full((tc_blk,), NEG_INF, jnp.float32)
        rden = jnp.zeros((tc_blk,), jnp.float32)
        a_acc = jnp.zeros((tc_blk, D), jnp.float32)
        b_acc = jnp.zeros((tc_blk, D), jnp.float32)
        for qi in range(n_qb):
            S, c_blk, q_blk = s_block(ci, qi)
            Sr = masked_rowwise(S, ci, qi)
            blk_max = Sr.max(axis=1)
            new_max = jnp.maximum(rmax, blk_max)
            scale = jnp.exp(rmax - new_max)
            p = jnp.exp(Sr - new_max[:, None])          # [tc_blk, tq_blk]
            rden = rden * scale + p.sum(axis=1)
            a_acc = a_acc * scale[:, None] + jnp.dot(
                p, q_blk, preferred_element_type=jnp.float32
            )
            b_acc = b_acc * scale[:, None] + jnp.dot(
                p, qc_blocks[qi], preferred_element_type=jnp.float32
            )
            rmax = new_max
        inv = 1.0 / jnp.maximum(rden, 1e-30)
        a = a_acc * inv[:, None]
        b = b_acc * inv[:, None]
        c_blk = c_hbm[0, ci * tc_blk:(ci + 1) * tc_blk, :]
        sl = slice(ci * tc_blk, (ci + 1) * tc_blk)
        out_ref[0, sl, 0 * D:1 * D] = c_blk
        out_ref[0, sl, 1 * D:2 * D] = a
        out_ref[0, sl, 2 * D:3 * D] = c_blk * a
        out_ref[0, sl, 3 * D:4 * D] = c_blk * b


@partial(jax.jit, static_argnames=("tc_blk", "tq_blk", "interpret"))
def bidaf_attention_tiled(
    params: dict,
    c: jax.Array,
    q: jax.Array,
    c_mask: jax.Array,
    q_mask: jax.Array,
    tc_blk: int = 128,
    tq_blk: int = 128,
    interpret: bool | None = None,
) -> jax.Array:
    """Blockwise BiDAF → ``[B, T_c, 4D]``; pads T_c/T_q to block multiples."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T_c0, D = c.shape
    T_q0 = q.shape[1]
    f32 = jnp.float32

    tc_blk = min(tc_blk, max(8, T_c0))
    tq_blk = min(tq_blk, max(8, T_q0))
    pad_c = -T_c0 % tc_blk
    pad_q = -T_q0 % tq_blk
    if pad_c:
        c = jnp.pad(c, ((0, 0), (0, pad_c), (0, 0)))
        c_mask = jnp.pad(c_mask, ((0, 0), (0, pad_c)))
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0)))
        q_mask = jnp.pad(q_mask, ((0, 0), (0, pad_q)))
    T_c, T_q = T_c0 + pad_c, T_q0 + pad_q

    out = pl.pallas_call(
        partial(_tiled_kernel, tc_blk=tc_blk, tq_blk=tq_blk),
        out_shape=jax.ShapeDtypeStruct((B, T_c, 4 * D), f32),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T_c, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T_q, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, T_c), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, T_q), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, T_c, 4 * D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        c.astype(f32), q.astype(f32), c_mask.astype(f32), q_mask.astype(f32),
        params["w_c"].astype(f32)[None], params["w_q"].astype(f32)[None],
        params["w_cq"].astype(f32)[None], params["bias"].astype(f32).reshape(1, 1),
    )
    return out[:, :T_c0, :]
