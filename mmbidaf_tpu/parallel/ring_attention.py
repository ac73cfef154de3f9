"""Ring-scheduled BiDAF attention over the device mesh (SURVEY.md §3.3).

The blockwise two-pass schedule of ``ops/pallas/bidaf_tiled_kernel.py`` was
built "ring-ready": its only cross-block state is the flash-style softmax
stats plus the unnormalized ``s_colᵀ·c`` accumulator. This module cashes
that in: both sequence axes are sharded over a mesh axis, and q-shards
rotate around the ring via ``lax.ppermute`` while each device's c-shard
stays resident — the standard ring-attention dataflow, with BiDAF's extra
wrinkle that the COLUMN softmax stats must travel with the q-shard.

Two rotations of the ring:

  pass 1: the payload ``(q, q_mask, col_max, col_denom, qc_unnorm)`` visits
    every device; each visit folds the local c-shard into the flash column
    stats and the unnormalized ``s_colᵀ·c``. After n hops the payload is
    home and ``qc = qc_unnorm / col_denom`` is exact.
  pass 2: the payload ``(q, q_mask, qc)`` rotates again; each device
    accumulates its LOCAL flash row softmax and the ``a``/``b`` outputs for
    its c-shard.

The local block update is numerically identical to the tiled kernel's
(same -1e30 multiplicative masking, same rescale order), so
ring == tiled == jnp exactly up to fp reassociation. Collectives ride ICI;
XLA overlaps the ppermute with the block compute.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30


def make_ring_bidaf(mesh: Mesh, axis: str | None = None):
    """Build ``ring_fn(params, c, q, c_mask, q_mask) → [B, T_c, 4D]``.

    ``c [B, T_c, D]`` / ``q [B, T_q, D]`` are sharded on their sequence axes
    over ``axis`` (padded here to divide the ring); params are replicated.
    """
    axis = axis or mesh.axis_names[-1]
    n = mesh.shape[axis]
    perm = [(i, (i + 1) % n) for i in range(n)]

    def rotate(tree):
        return jax.tree.map(lambda x: jax.lax.ppermute(x, axis, perm), tree)

    def local_body(w_c, w_q, w_cq, bias, c_loc, q_loc, cm_loc, qm_loc):
        # c_loc [B, tc, D]; q_loc [B, tq, D]; masks [B, tc]/[B, tq]
        B, tq = qm_loc.shape
        D = c_loc.shape[-1]

        def sim(q_cur):
            s0 = (c_loc * w_c).sum(-1)[:, :, None]
            s1 = (q_cur * w_q).sum(-1)[:, None, :]
            s2 = jnp.einsum(
                "btd,bsd->bts", c_loc * w_cq, q_cur,
                preferred_element_type=jnp.float32,
            )
            return s0 + s1 + s2 + bias                    # [B, tc, tq]

        # ---- pass 1: ring the column-softmax stats with each q-shard ----
        state = (
            q_loc, qm_loc,
            jnp.full((B, tq), NEG_INF, jnp.float32),      # running col max
            jnp.zeros((B, tq), jnp.float32),              # running col denom
            jnp.zeros((B, tq, D), jnp.float32),           # unnormalized s_colᵀ·c
        )
        cm = cm_loc[:, :, None]
        for _ in range(n):
            q_cur, qm_cur, cmax, cden, qc = state
            Sc = cm * sim(q_cur) + (1.0 - cm) * NEG_INF
            blk_max = Sc.max(axis=1)
            new_max = jnp.maximum(cmax, blk_max)
            scale = jnp.exp(cmax - new_max)
            p = jnp.exp(Sc - new_max[:, None, :])
            cden = cden * scale + p.sum(axis=1)
            qc = qc * scale[..., None] + jnp.einsum(
                "bts,btd->bsd", p, c_loc, preferred_element_type=jnp.float32
            )
            state = rotate((q_cur, qm_cur, new_max, cden, qc))
        q_home, qm_home, _, cden, qc = state
        qcn = qc / jnp.maximum(cden, 1e-30)[..., None]

        # ---- pass 2: local flash row softmax over the rotating q-shards ----
        tc = c_loc.shape[1]
        rmax = jnp.full((B, tc), NEG_INF, jnp.float32)
        rden = jnp.zeros((B, tc), jnp.float32)
        a_acc = jnp.zeros((B, tc, D), jnp.float32)
        b_acc = jnp.zeros((B, tc, D), jnp.float32)
        state2 = (q_home, qm_home, qcn)
        for _ in range(n):
            q_cur, qm_cur, qc_cur = state2
            qm = qm_cur[:, None, :]
            Sr = qm * sim(q_cur) + (1.0 - qm) * NEG_INF
            blk_max = Sr.max(axis=2)
            new_max = jnp.maximum(rmax, blk_max)
            scale = jnp.exp(rmax - new_max)
            p = jnp.exp(Sr - new_max[:, :, None])
            rden = rden * scale + p.sum(axis=2)
            a_acc = a_acc * scale[..., None] + jnp.einsum(
                "bts,bsd->btd", p, q_cur, preferred_element_type=jnp.float32
            )
            b_acc = b_acc * scale[..., None] + jnp.einsum(
                "bts,bsd->btd", p, qc_cur, preferred_element_type=jnp.float32
            )
            rmax = new_max
            state2 = rotate(state2)
        inv = (1.0 / jnp.maximum(rden, 1e-30))[..., None]
        a = a_acc * inv
        b = b_acc * inv
        return jnp.concatenate([c_loc, a, c_loc * a, c_loc * b], axis=-1)

    sharded = shard_map(
        local_body,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(),
                  P(None, axis, None), P(None, axis, None),
                  P(None, axis), P(None, axis)),
        out_specs=P(None, axis, None),
        check_rep=False,
    )

    @jax.jit
    def ring_fn(params, c, q, c_mask, q_mask):
        f32 = jnp.float32
        B, T_c0, D = c.shape
        T_q0 = q.shape[1]
        pad_c = -T_c0 % n
        pad_q = -T_q0 % n
        if pad_c:
            c = jnp.pad(c, ((0, 0), (0, pad_c), (0, 0)))
            c_mask = jnp.pad(c_mask, ((0, 0), (0, pad_c)))
        if pad_q:
            q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0)))
            q_mask = jnp.pad(q_mask, ((0, 0), (0, pad_q)))
        out = sharded(
            params["w_c"].astype(f32), params["w_q"].astype(f32),
            params["w_cq"].astype(f32), params["bias"].astype(f32),
            c.astype(f32), q.astype(f32),
            c_mask.astype(f32), q_mask.astype(f32),
        )
        return out[:, :T_c0, :]

    return ring_fn
