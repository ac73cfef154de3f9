"""Sequence-parallel BiLSTM: the time axis sharded over the mesh
(SURVEY.md §3.3 "SP/CP" row — the follow-through past the mel frontend:
`audio_sp.py` leaves the mel frames frame-sharded; this runs the audio
tower's recurrence on those shards without gathering the long axis).

An LSTM is sequential in time, so a time-shard cannot start until its left
neighbor's final state arrives. The classic fix is a **microbatch
wavefront** (pipeline parallelism along the time axis):

- device ``d`` holds the contiguous time chunk ``[d·T/D, (d+1)·T/D)``;
- the batch splits into ``M`` microbatches; in round ``r`` device ``d``
  runs its chunk for forward-direction microbatch ``m = r - d`` (and, in
  the same round, backward-direction microbatch ``m = r - (D-1-d)`` — the
  reverse pipeline fills from the other end, so both directions keep the
  same devices busy);
- at the end of each round the (h, c) carries hop one device along the
  ring (``ppermute``; +1 for forward, −1 for backward). Devices outside
  the wavefront compute on clamped indices and their writes are masked.

Total ``M + D - 1`` rounds of ``T/D`` steps each: for ``M = D`` the
sequential depth is ``(2 - 1/D)·T/D`` versus ``T`` unpipelined — a
``D/2``-ish wall-clock win for long sequences, with the per-step gate
GEMMs also ``D×`` smaller per device. pack_padded_sequence semantics are
preserved exactly: the per-step state freeze at masked positions carries
the "last valid state" across chunk boundaries in the ppermuted carry.

Outputs stay time-sharded (``P(None, axis)``) so a ring-attention stage
(`ring_attention.py`) can consume them without a gather; final (h, c)
states are not returned (the audio tower uses outputs only — SURVEY §3.1
`RNNEncoder`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from mmbidaf_tpu.ops.lstm import lstm_cell


def _local_scan(w_h, gates, mask, state):
    """Masked LSTM scan over one local chunk. ``gates [Bm, Tc, 4h]``,
    ``mask [Bm, Tc]`` → ``(out [Bm, Tc, h], (h, c))`` (freeze-at-pad)."""

    def step(carry, inp):
        h, c = carry
        g_t, m_t = inp
        h_new, c_new = lstm_cell(g_t, h, c, w_h)
        m = m_t[:, None]
        return (m * h_new + (1.0 - m) * h, m * c_new + (1.0 - m) * c), h_new * m

    (h, c), out = jax.lax.scan(
        step, state, (jnp.swapaxes(gates, 0, 1), jnp.swapaxes(mask, 0, 1))
    )
    return jnp.swapaxes(out, 0, 1), (h, c)


def make_sp_bilstm(
    mesh: Mesh,
    axis: str | None = None,
    microbatches: int | None = None,
    batch_axis: str | tuple[str, ...] | None = None,
):
    """Build a jitted ``(params, x [B,T,Din], mask [B,T]) → out [B,T,2h]``
    BiLSTM whose time axis lives sharded over ``axis``. ``params`` is a
    `bilstm_init` pytree (replicated). The mesh axis size must divide
    ``T``, and ``microbatches`` (default ``min(D, B_local)``) must divide
    the (per-``batch_axis``-shard) batch. ``batch_axis`` shards the batch
    dim over that mesh axis (DP × SP composition).

    Pipeline fill: with fewer microbatches than devices (``B_local < D``)
    the wavefront cannot cover every device each round — correctness holds
    but ``(D - M)/D`` of each round is idle; that regime is inherent to
    pipelining a recurrence, not a bug (B=1 long-audio serving accepts it
    for the D× smaller per-device GEMMs + sharded residency).

    Parity: identical outputs to ``ops.lstm.bilstm_apply`` (same masked
    scan, same torch output layout ``[fwd; bwd]``).
    """
    axis = axis or mesh.axis_names[-1]
    D = mesh.shape[axis]
    # batch_axis may be a single name or a tuple of names (multi-host DP:
    # the batch dim shards over ('dcn', 'data') — sp_tower.sp_axes)
    _baxes = (
        (batch_axis,) if isinstance(batch_axis, str) else tuple(batch_axis or ())
    )
    B_div = 1
    for a in _baxes:
        B_div *= mesh.shape[a]

    def body(params, x, mask):
        d = jax.lax.axis_index(axis)
        B, Tc, _ = x.shape  # local chunk shapes
        if microbatches is None:
            # largest divisor of B that fits the device count: arbitrary
            # batch sizes (e.g. summarize_long's window batches) stay
            # valid, at worst with a shallower wavefront
            M = min(D, B)
            while B % M:
                M -= 1
        else:
            M = microbatches
            if B % M:
                raise ValueError(
                    f"SP BiLSTM: microbatches {M} must divide the per-shard "
                    f"batch {B} — pass microbatches= a divisor of the batch, "
                    f"or size the batch as a multiple of the {axis!r} axis ({D})"
                )
        Bm = B // M
        h_dim = params["fwd"]["w_h"].shape[0]
        dtype = x.dtype

        # Hoisted input GEMMs for the whole local chunk (both directions);
        # the backward direction runs on the locally time-flipped chunk —
        # local flip + reversed device order == global flip.
        g_f = x @ params["fwd"]["w_x"] + params["fwd"]["b"]
        g_b = jnp.flip(x @ params["bwd"]["w_x"] + params["bwd"]["b"], axis=1)
        m_f = mask.astype(dtype)
        m_b = jnp.flip(m_f, axis=1)

        def mb_split(a):
            return a.reshape(M, Bm, *a.shape[1:])

        g_f, g_b, m_f, m_b = map(mb_split, (g_f, g_b, m_f, m_b))

        zeros = jnp.zeros((Bm, h_dim), dtype)
        out_shape = (M, Bm, Tc, h_dim)
        perm_f = [(i, i + 1) for i in range(D - 1)]
        perm_b = [(i + 1, i) for i in range(D - 1)]

        def round_body(carry, r):
            sf, sb, of, ob = carry
            i_f = r - d               # forward microbatch at this device
            i_b = r - (D - 1 - d)     # backward pipeline fills from the end
            act_f = jnp.logical_and(i_f >= 0, i_f < M)
            act_b = jnp.logical_and(i_b >= 0, i_b < M)
            i_f = jnp.clip(i_f, 0, M - 1)
            i_b = jnp.clip(i_b, 0, M - 1)

            o_f, sf_new = _local_scan(
                params["fwd"]["w_h"],
                jax.lax.dynamic_index_in_dim(g_f, i_f, 0, keepdims=False),
                jax.lax.dynamic_index_in_dim(m_f, i_f, 0, keepdims=False),
                sf,
            )
            o_b, sb_new = _local_scan(
                params["bwd"]["w_h"],
                jax.lax.dynamic_index_in_dim(g_b, i_b, 0, keepdims=False),
                jax.lax.dynamic_index_in_dim(m_b, i_b, 0, keepdims=False),
                sb,
            )

            # Outside the wavefront the compute ran on clamped indices:
            # mask the buffer write (a receiver consumes a sent state only
            # in rounds where its sender was active, so states need no mask).
            of = jnp.where(act_f, jax.lax.dynamic_update_index_in_dim(of, o_f, i_f, 0), of)
            ob = jnp.where(act_b, jax.lax.dynamic_update_index_in_dim(ob, o_b, i_b, 0), ob)

            # Carry hop: devices with no inbound edge (the pipeline heads)
            # receive ppermute's zero fill — exactly the LSTM init state.
            sf = tuple(jax.lax.ppermute(s, axis, perm_f) for s in sf_new)
            sb = tuple(jax.lax.ppermute(s, axis, perm_b) for s in sb_new)
            return (sf, sb, of, ob), None

        init = (
            (zeros, zeros),
            (zeros, zeros),
            jnp.zeros(out_shape, dtype),
            jnp.zeros(out_shape, dtype),
        )
        (_, _, out_f, out_b), _ = jax.lax.scan(
            round_body, init, jnp.arange(M + D - 1)
        )
        out_f = out_f.reshape(B, Tc, h_dim)
        out_b = jnp.flip(out_b.reshape(B, Tc, h_dim), axis=1)  # un-flip local time
        return jnp.concatenate([out_f, out_b], axis=-1)

    sharded = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(batch_axis, axis), P(batch_axis, axis)),
        out_specs=P(batch_axis, axis),
        check_rep=False,
    )

    @jax.jit
    def sp_bilstm(params, x, mask):
        B, T = mask.shape
        if T % D:
            raise ValueError(
                f"SP BiLSTM: sequence length {T} must be divisible by the "
                f"{D}-device {axis!r} mesh axis — pad the time bucket to a "
                f"multiple of {D}"
            )
        if B % B_div:
            raise ValueError(
                f"SP BiLSTM: batch {B} must be divisible by the {B_div}-device "
                f"{batch_axis!r} mesh axis"
            )
        return sharded(params, x, mask)

    return sp_bilstm
