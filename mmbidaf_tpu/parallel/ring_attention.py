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

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30


def make_ring_bidaf(
    mesh: Mesh,
    axis: str | None = None,
    batch_axis: str | tuple[str, ...] | None = None,
    dropout: bool = False,
):
    """Build ``ring_fn(params, c, q, c_mask, q_mask) → [B, T_c, 4D]``.

    ``c [B, T_c, D]`` / ``q [B, T_q, D]`` are sharded on their sequence axes
    over ``axis`` (padded here to divide the ring); params are replicated.
    ``batch_axis`` shards the batch dim over that mesh axis (DP × SP).

    ``dropout=True`` returns the training variant
    ``ring_fn(params, c, q, cd, qd, c_mask, q_mask)`` where ``cd``/``qd``
    are pre-dropped copies feeding ONLY the similarity matrix (reference
    semantics: dropout perturbs S; the a/b outputs use undropped c/q —
    same contract as the fused Pallas kernel's dropout variant). The caller
    generates the bernoulli masks at full shape, so rng consumption matches
    the local path exactly.

    Dtype: operands are force-cast to f32 — the flash column/row softmax
    stats and the similarity products need f32 range; under a bf16 model
    the caller casts the (f32) output back at the stage boundary
    (`sp_tower.py`), matching the fused Pallas kernel's f32-stats design.
    """
    axis = axis or mesh.axis_names[-1]
    n = mesh.shape[axis]
    perm = [(i, (i + 1) % n) for i in range(n)]

    def rotate(tree):
        return jax.tree.map(lambda x: jax.lax.ppermute(x, axis, perm), tree)

    def local_body(w_c, w_q, w_cq, bias, c_loc, q_loc, cd_loc, qd_loc, cm_loc, qm_loc):
        # c_loc [B, tc, D]; q_loc [B, tq, D]; masks [B, tc]/[B, tq];
        # cd/qd: the (maybe-dropped) similarity operands. When the caller is
        # the no-dropout variant, cd/qd are None and the ring payload stays
        # lean (no duplicate q rotation — collectives don't CSE post-SPMD).
        B, tq = qm_loc.shape
        D = c_loc.shape[-1]
        cd = c_loc if cd_loc is None else cd_loc

        def sim(qd_cur):
            s0 = (cd * w_c).sum(-1)[:, :, None]
            s1 = (qd_cur * w_q).sum(-1)[:, None, :]
            s2 = jnp.einsum(
                "btd,bsd->bts", cd * w_cq, qd_cur,
                preferred_element_type=jnp.float32,
            )
            return s0 + s1 + s2 + bias                    # [B, tc, tq]

        def split(payload):
            """payload → (q_cur, qd_cur, qm_cur, rest...) with qd aliasing
            q when the payload has no dropped copy."""
            if qd_loc is None:
                q_cur, qm_cur, *rest = payload
                return q_cur, q_cur, qm_cur, rest
            q_cur, qd_cur, qm_cur, *rest = payload
            return q_cur, qd_cur, qm_cur, rest

        def join(q_cur, qd_cur, qm_cur, rest):
            head = (q_cur, qm_cur) if qd_loc is None else (q_cur, qd_cur, qm_cur)
            return (*head, *rest)

        # ---- pass 1: ring the column-softmax stats with each q-shard ----
        state = join(
            q_loc, qd_loc, qm_loc,
            (
                jnp.full((B, tq), NEG_INF, jnp.float32),  # running col max
                jnp.zeros((B, tq), jnp.float32),          # running col denom
                jnp.zeros((B, tq, D), jnp.float32),       # unnormalized s_colᵀ·c
            ),
        )
        cm = cm_loc[:, :, None]
        for _ in range(n):
            q_cur, qd_cur, qm_cur, (cmax, cden, qc) = split(state)
            Sc = cm * sim(qd_cur) + (1.0 - cm) * NEG_INF
            blk_max = Sc.max(axis=1)
            new_max = jnp.maximum(cmax, blk_max)
            scale = jnp.exp(cmax - new_max)
            p = jnp.exp(Sc - new_max[:, None, :])
            cden = cden * scale + p.sum(axis=1)
            qc = qc * scale[..., None] + jnp.einsum(
                "bts,btd->bsd", p, c_loc, preferred_element_type=jnp.float32
            )
            state = rotate(join(q_cur, qd_cur, qm_cur, (new_max, cden, qc)))
        q_home, qd_home, qm_home, (_, cden, qc) = split(state)
        qcn = qc / jnp.maximum(cden, 1e-30)[..., None]

        # ---- pass 2: local flash row softmax over the rotating q-shards ----
        tc = c_loc.shape[1]
        rmax = jnp.full((B, tc), NEG_INF, jnp.float32)
        rden = jnp.zeros((B, tc), jnp.float32)
        a_acc = jnp.zeros((B, tc, D), jnp.float32)
        b_acc = jnp.zeros((B, tc, D), jnp.float32)
        state2 = join(q_home, qd_home, qm_home, (qcn,))
        for _ in range(n):
            q_cur, qd_cur, qm_cur, (qc_cur,) = split(state2)
            qm = qm_cur[:, None, :]
            Sr = qm * sim(qd_cur) + (1.0 - qm) * NEG_INF
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

    if dropout:
        body_fn = local_body
    else:
        def body_fn(w_c, w_q, w_cq, bias, c_loc, q_loc, cm_loc, qm_loc):
            return local_body(
                w_c, w_q, w_cq, bias, c_loc, q_loc, None, None, cm_loc, qm_loc
            )

    seq3 = P(batch_axis, axis, None)
    seq2 = P(batch_axis, axis)
    sharded = shard_map(
        body_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), seq3, seq3)
        + ((seq3, seq3) if dropout else ())
        + (seq2, seq2),
        out_specs=seq3,
        check_rep=False,
    )

    def pad_seq(x, pad, ndim3=True):
        if not pad:
            return x
        widths = ((0, 0), (0, pad), (0, 0)) if ndim3 else ((0, 0), (0, pad))
        return jnp.pad(x, widths)

    @jax.jit
    def ring_fn(params, c, q, c_mask, q_mask):
        f32 = jnp.float32
        T_c0, T_q0 = c.shape[1], q.shape[1]
        pad_c, pad_q = -T_c0 % n, -T_q0 % n
        c, q = pad_seq(c, pad_c), pad_seq(q, pad_q)
        c_mask, q_mask = pad_seq(c_mask, pad_c, False), pad_seq(q_mask, pad_q, False)
        out = sharded(
            params["w_c"].astype(f32), params["w_q"].astype(f32),
            params["w_cq"].astype(f32), params["bias"].astype(f32),
            c.astype(f32), q.astype(f32),
            c_mask.astype(f32), q_mask.astype(f32),
        )
        return out[:, :T_c0, :]

    @jax.jit
    def ring_fn_dropout(params, c, q, cd, qd, c_mask, q_mask):
        f32 = jnp.float32
        T_c0, T_q0 = c.shape[1], q.shape[1]
        pad_c, pad_q = -T_c0 % n, -T_q0 % n
        c, cd = pad_seq(c, pad_c), pad_seq(cd, pad_c)
        q, qd = pad_seq(q, pad_q), pad_seq(qd, pad_q)
        c_mask, q_mask = pad_seq(c_mask, pad_c, False), pad_seq(q_mask, pad_q, False)
        out = sharded(
            params["w_c"].astype(f32), params["w_q"].astype(f32),
            params["w_cq"].astype(f32), params["bias"].astype(f32),
            c.astype(f32), q.astype(f32), cd.astype(f32), qd.astype(f32),
            c_mask.astype(f32), q_mask.astype(f32),
        )
        return out[:, :T_c0, :]

    return ring_fn_dropout if dropout else ring_fn
