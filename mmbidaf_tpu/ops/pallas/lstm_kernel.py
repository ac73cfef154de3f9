"""Pallas LSTM kernel: the whole recurrence in ONE kernel invocation.

Replaces the reference's cuDNN fused LSTM (SURVEY.md §3.2 row 1) more
aggressively than the ``lax.scan`` version: the TPU grid is *sequential*, so
``grid=(T,)`` with the (h, c) state living in VMEM scratch across grid steps
executes the recurrence with zero XLA while-loop overhead, while Pallas
double-buffers the per-step gate blocks HBM→VMEM automatically.

Contract matches ``mmbidaf_tpu.ops.lstm.lstm_scan`` exactly (pack_padded
semantics: masked steps freeze state and emit zeros; reverse runs via
flipped index maps — no data movement). The input projection
``x @ W_x + b`` stays outside (one big MXU GEMM over all timesteps).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lstm_kernel(gates_ref, mask_ref, wh_ref, out_ref, hlast_ref, clast_ref, state,
                 *, t_axis=0):
    t = pl.program_id(t_axis)
    T = pl.num_programs(t_axis)

    @pl.when(t == 0)
    def _():
        state[...] = jnp.zeros_like(state)

    h = state[0]
    c = state[1]
    hdim = h.shape[-1]

    z = gates_ref[0] + jnp.dot(h, wh_ref[:], preferred_element_type=jnp.float32)
    i = jax.nn.sigmoid(z[:, 0 * hdim:1 * hdim])
    f = jax.nn.sigmoid(z[:, 1 * hdim:2 * hdim])
    g = jnp.tanh(z[:, 2 * hdim:3 * hdim])
    o = jax.nn.sigmoid(z[:, 3 * hdim:4 * hdim])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)

    m = mask_ref[t, :][:, None]
    state[0] = m * h_new + (1.0 - m) * h
    state[1] = m * c_new + (1.0 - m) * c
    out_ref[0] = h_new * m

    @pl.when(t == T - 1)
    def _():
        hlast_ref[:] = state[0]
        clast_ref[:] = state[1]


@partial(jax.jit, static_argnames=("reverse", "interpret", "row_chunk"))
def lstm_pallas(
    params: dict,
    x: jax.Array,
    mask: jax.Array,
    reverse: bool = False,
    interpret: bool | None = None,
    row_chunk: int = 0,
) -> tuple[jax.Array, tuple[jax.Array, jax.Array]]:
    """Drop-in replacement for ``lstm_scan`` (same outputs/semantics).

    ``row_chunk`` (0 = whole batch) splits the batch rows over an outer grid
    dimension so huge effective batches (word-level LSTM sees
    batch × sentences rows) fit the kernel's scoped VMEM: grid ``(nb, T)``
    runs the full recurrence per row-chunk with only that chunk's state
    resident. Must divide B. The single-chunk path keeps the exact original
    ``grid=(T,)`` program (same HLO → warm compile caches)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, _ = x.shape
    h_dim = params["w_h"].shape[0]
    f32 = jnp.float32
    C = row_chunk or B
    if B % C:
        raise ValueError(f"row_chunk {C} must divide batch rows {B}")
    nb = B // C

    gates_all = (x @ params["w_x"] + params["b"]).astype(f32)  # [B, T, 4h]
    gates_all = jnp.swapaxes(gates_all, 0, 1)                  # [T, B, 4h]
    mask_t = jnp.swapaxes(mask, 0, 1).astype(f32)              # [T, B]

    if reverse:
        # Kernel step t reads gates[T-1-t] and writes out[T-1-t] via the
        # index maps (no data movement); the mask is indexed by kernel step
        # directly, so it must be flipped to follow the gates stream.
        mask_for_kernel = jnp.flip(mask_t, axis=0)
    else:
        mask_for_kernel = mask_t

    cost = pl.CostEstimate(
        flops=2 * T * B * h_dim * 4 * h_dim,
        bytes_accessed=4 * T * B * (4 * h_dim + h_dim) + 4 * h_dim * 4 * h_dim,
        transcendentals=5 * T * B * h_dim,
    )
    if nb == 1:
        g_idx = (lambda t: (T - 1 - t, 0, 0)) if reverse else (lambda t: (t, 0, 0))
        out, h_last, c_last = pl.pallas_call(
            _lstm_kernel,
            out_shape=[
                jax.ShapeDtypeStruct((T, B, h_dim), f32),
                jax.ShapeDtypeStruct((B, h_dim), f32),
                jax.ShapeDtypeStruct((B, h_dim), f32),
            ],
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, B, 4 * h_dim), g_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((T, B), lambda t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((h_dim, 4 * h_dim), lambda t: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, B, h_dim), g_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((B, h_dim), lambda t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B, h_dim), lambda t: (0, 0), memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[pltpu.VMEM((2, B, h_dim), f32)],
            interpret=interpret,
            cost_estimate=cost,
        )(gates_all, mask_for_kernel, params["w_h"].astype(f32))
    else:
        # Chunked grid: b outermost, t innermost → per row-chunk the state
        # scratch resets at t == 0 and the h/c outputs flush at t == T-1,
        # exactly the single-chunk schedule run nb times.
        g_idx = (lambda b, t: (T - 1 - t, b, 0)) if reverse else (lambda b, t: (t, b, 0))
        out, h_last, c_last = pl.pallas_call(
            partial(_lstm_kernel, t_axis=1),
            out_shape=[
                jax.ShapeDtypeStruct((T, B, h_dim), f32),
                jax.ShapeDtypeStruct((B, h_dim), f32),
                jax.ShapeDtypeStruct((B, h_dim), f32),
            ],
            grid=(nb, T),
            in_specs=[
                pl.BlockSpec((1, C, 4 * h_dim), g_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((T, C), lambda b, t: (0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec((h_dim, 4 * h_dim), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, C, h_dim), g_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((C, h_dim), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((C, h_dim), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[pltpu.VMEM((2, C, h_dim), f32)],
            interpret=interpret,
            cost_estimate=cost,
        )(gates_all, mask_for_kernel, params["w_h"].astype(f32))
    return jnp.swapaxes(out, 0, 1), (h_last, c_last)


_VMEM_BUDGET = int(15.5 * 1024 * 1024)  # TPU scoped-vmem limit is 16 MiB


def _kernel_vmem_bytes(B: int, T: int, h: int) -> int:
    """Rough f32 bytes resident in VMEM for one direction's pallas_call:
    double-buffered ``(1, B, 4h)`` gate blocks + ``(T, B)`` mask +
    ``(h, 4h)`` W_h + out block / h / c / scratch (5 × ``(B, h)``).
    Calibrated against the compiler's scoped-vmem report (26 MB at
    B=4096, h=128, T=16 — the word-level LSTM, where the effective batch
    is batch × sentences)."""
    return 4 * (2 * B * 4 * h + T * B + 4 * h * h + 5 * B * h)


def _fits_vmem(params, x, scale: int = 1) -> bool:
    B, T, _ = x.shape
    h = params["fwd"]["w_h"].shape[0]
    return scale * _kernel_vmem_bytes(int(B), int(T), int(h)) <= _VMEM_BUDGET


def _best_row_chunk(params, x, scale: int = 1) -> int | None:
    """Largest divisor of the batch whose per-chunk VMEM estimate fits
    (0 = whole batch fits; None = no usable chunking, e.g. a huge prime
    batch — caller falls back to the scan)."""
    B, T, _ = x.shape
    h = params["fwd"]["w_h"].shape[0]
    if scale * _kernel_vmem_bytes(int(B), int(T), int(h)) <= _VMEM_BUDGET:
        return 0
    for c in range(int(B) // 2, 0, -1):
        if B % c == 0 and scale * _kernel_vmem_bytes(c, int(T), int(h)) <= _VMEM_BUDGET:
            # Tiny chunks lose the kernel's point (per-step GEMMs degrade
            # below the MXU tile) — the scan is the better program there.
            return c if c >= 8 else None
    return None


def bilstm_pallas(
    params: dict, x: jax.Array, mask: jax.Array, interpret: bool | None = None
) -> tuple[jax.Array, tuple[jax.Array, jax.Array]]:
    """Bidirectional wrapper matching ``ops.lstm.bilstm_apply``.

    Huge effective batches (batch × sentences rows at serving batch ≥ 128)
    overflow the kernel's scoped VMEM as a single block — the batch rows
    are then chunked over an outer grid dimension (``row_chunk``), and only
    if no divisor chunk fits does this fall back to the jnp scan (a crash
    is never the right trade)."""
    chunk = 0 if interpret else _best_row_chunk(params, x)
    if chunk is None:
        from mmbidaf_tpu.ops.lstm import bilstm_apply

        return bilstm_apply(params, x, mask)
    out_f, (h_f, c_f) = lstm_pallas(
        params["fwd"], x, mask, reverse=False, interpret=interpret, row_chunk=chunk
    )
    out_b, (h_b, c_b) = lstm_pallas(
        params["bwd"], x, mask, reverse=True, interpret=interpret, row_chunk=chunk
    )
    out = jnp.concatenate([out_f, out_b], axis=-1)
    return out, (
        jnp.concatenate([h_f, h_b], axis=-1),
        jnp.concatenate([c_f, c_b], axis=-1),
    )


# ---------------------------------------------------------------------------
# Trainable variant: forward kernel that also emits the carried (h, c)
# sequences as BPTT residuals, plus a sequential-grid BACKWARD kernel that
# walks t = T-1 → 0, recomputes each step's gates from the carried state,
# and accumulates dW_h in VMEM across grid steps (SURVEY §3.2 row 1 —
# training-path fused LSTM; the round-1 kernel was inference-only).
# The big GEMMs (x→gates in fwd, dgates→dx / dW_x in bwd) stay outside.
# ---------------------------------------------------------------------------


def _lstm_fwd_train_kernel(gates_ref, mask_ref, wh_ref,
                           out_ref, hseq_ref, cseq_ref, state, *, t_axis=0):
    t = pl.program_id(t_axis)

    @pl.when(t == 0)
    def _():
        state[...] = jnp.zeros_like(state)

    h = state[0]
    c = state[1]
    hdim = h.shape[-1]

    z = gates_ref[0] + jnp.dot(h, wh_ref[:], preferred_element_type=jnp.float32)
    i = jax.nn.sigmoid(z[:, 0 * hdim:1 * hdim])
    f = jax.nn.sigmoid(z[:, 1 * hdim:2 * hdim])
    g = jnp.tanh(z[:, 2 * hdim:3 * hdim])
    o = jax.nn.sigmoid(z[:, 3 * hdim:4 * hdim])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)

    m = mask_ref[t, :][:, None]
    state[0] = m * h_new + (1.0 - m) * h
    state[1] = m * c_new + (1.0 - m) * c
    out_ref[0] = h_new * m
    hseq_ref[0] = state[0]
    cseq_ref[0] = state[1]


def _lstm_bwd_kernel(gates_ref, mask_ref, wh_ref, hprev_ref, cprev_ref,
                     dout_ref, dhlast_ref, dclast_ref,
                     dgates_ref, dwh_ref, state, *, t_axis=0):
    s = pl.program_id(t_axis)
    T = pl.num_programs(t_axis)
    t = T - 1 - s
    # dW_h accumulates across the WHOLE grid (its block is resident for all
    # programs); in the row-chunked grid it must initialize only on the very
    # first program, while the dh/dc carry re-seeds per row-chunk at s == 0.
    first_program = jnp.logical_and(s == 0, pl.program_id(0) == 0) if t_axis else s == 0

    @pl.when(s == 0)
    def _():
        state[0] = dhlast_ref[:]
        state[1] = dclast_ref[:]

    # Carried state entering step t (zeros at t == 0; the block loaded by
    # the clamped index map is ignored via the scalar gate below).
    not_first = jnp.where(s == T - 1, 0.0, 1.0)
    h_prev = hprev_ref[0] * not_first
    c_prev = cprev_ref[0] * not_first

    hdim = h_prev.shape[-1]
    z = gates_ref[0] + jnp.dot(h_prev, wh_ref[:], preferred_element_type=jnp.float32)
    i = jax.nn.sigmoid(z[:, 0 * hdim:1 * hdim])
    f = jax.nn.sigmoid(z[:, 1 * hdim:2 * hdim])
    g = jnp.tanh(z[:, 2 * hdim:3 * hdim])
    o = jax.nn.sigmoid(z[:, 3 * hdim:4 * hdim])
    c_new = f * c_prev + i * g
    tanh_c = jnp.tanh(c_new)

    m = mask_ref[t, :][:, None]
    dh_carry = state[0]
    dc_carry = state[1]

    dh_new = m * (dout_ref[0] + dh_carry)           # out_t = m·h_new; h_t = m·h_new + …
    do = dh_new * tanh_c
    dc_new = dh_new * o * (1.0 - tanh_c * tanh_c) + m * dc_carry
    di = dc_new * g
    df = dc_new * c_prev
    dg = dc_new * i

    dz = jnp.concatenate(
        [di * i * (1.0 - i), df * f * (1.0 - f),
         dg * (1.0 - g * g), do * o * (1.0 - o)], axis=-1
    )
    dgates_ref[0] = dz
    state[0] = (1.0 - m) * dh_carry + jnp.dot(
        dz, wh_ref[:].T, preferred_element_type=jnp.float32
    )
    state[1] = f * dc_new + (1.0 - m) * dc_carry

    partial_wh = jnp.dot(h_prev.T, dz, preferred_element_type=jnp.float32)

    @pl.when(first_program)
    def _():
        dwh_ref[:] = partial_wh

    @pl.when(jnp.logical_not(first_program))
    def _():
        dwh_ref[:] += partial_wh


def _lstm_train_fwd_impl(params, x, mask, interpret, row_chunk=0):
    """Forward with residuals. x/mask are already in processing order."""
    B, T, _ = x.shape
    h_dim = params["w_h"].shape[0]
    f32 = jnp.float32
    C = row_chunk or B
    if B % C:
        # A (nb, T) grid over a non-divisor chunk would silently leave the
        # tail rows as uninitialized VMEM garbage — same contract as
        # lstm_pallas.
        raise ValueError(f"row_chunk {C} must divide batch rows {B}")
    nb = B // C
    gates_all = (x @ params["w_x"] + params["b"]).astype(f32)
    gates_all = jnp.swapaxes(gates_all, 0, 1)
    mask_t = jnp.swapaxes(mask, 0, 1).astype(f32)

    out_shape = [
        jax.ShapeDtypeStruct((T, B, h_dim), f32),
        jax.ShapeDtypeStruct((T, B, h_dim), f32),
        jax.ShapeDtypeStruct((T, B, h_dim), f32),
    ]
    if nb == 1:
        out, h_seq, c_seq = pl.pallas_call(
            _lstm_fwd_train_kernel,
            out_shape=out_shape,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, B, 4 * h_dim), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((T, B), lambda t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((h_dim, 4 * h_dim), lambda t: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, B, h_dim), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B, h_dim), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B, h_dim), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[pltpu.VMEM((2, B, h_dim), f32)],
            interpret=interpret,
        )(gates_all, mask_t, params["w_h"].astype(f32))
    else:
        out, h_seq, c_seq = pl.pallas_call(
            partial(_lstm_fwd_train_kernel, t_axis=1),
            out_shape=out_shape,
            grid=(nb, T),
            in_specs=[
                pl.BlockSpec((1, C, 4 * h_dim), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((T, C), lambda b, t: (0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec((h_dim, 4 * h_dim), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, C, h_dim), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C, h_dim), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C, h_dim), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[pltpu.VMEM((2, C, h_dim), f32)],
            interpret=interpret,
        )(gates_all, mask_t, params["w_h"].astype(f32))
    return out, h_seq, c_seq


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def lstm_pallas_trainable(params, x, mask, reverse=False, interpret=None, row_chunk=0):
    """``lstm_scan``-compatible Pallas LSTM with a fused Pallas BPTT VJP."""
    out, _, _, h_last, c_last = _lstm_train_fwd(
        params, x, mask, reverse, interpret, row_chunk
    )
    return out, (h_last, c_last)


def _lstm_train_fwd(params, x, mask, reverse, interpret, row_chunk=0):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    xp = jnp.flip(x, axis=1) if reverse else x
    mp = jnp.flip(mask, axis=1) if reverse else mask
    out, h_seq, c_seq = _lstm_train_fwd_impl(params, xp, mp, interpret, row_chunk)
    out_b = jnp.swapaxes(out, 0, 1)
    if reverse:
        out_b = jnp.flip(out_b, axis=1)
    return out_b, h_seq, c_seq, h_seq[-1], c_seq[-1]


def _trainable_fwd(params, x, mask, reverse, interpret, row_chunk):
    out_b, h_seq, c_seq, h_last, c_last = _lstm_train_fwd(
        params, x, mask, reverse, interpret, row_chunk
    )
    return (out_b, (h_last, c_last)), (params, x, mask, h_seq, c_seq)


def _trainable_bwd(reverse, interpret, row_chunk, res, cotangents):
    params, x, mask, h_seq, c_seq = res
    dout, (dh_last, dc_last) = cotangents
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, _ = x.shape
    h_dim = params["w_h"].shape[0]
    f32 = jnp.float32
    C = row_chunk or B
    nb = B // C

    xp = jnp.flip(x, axis=1) if reverse else x
    mp = jnp.flip(mask, axis=1) if reverse else mask
    doutp = jnp.flip(dout, axis=1) if reverse else dout

    gates_all = (xp @ params["w_x"] + params["b"]).astype(f32)  # recompute
    gates_all = jnp.swapaxes(gates_all, 0, 1)                   # [T, B, 4h]
    mask_t = jnp.swapaxes(mp, 0, 1).astype(f32)
    dout_t = jnp.swapaxes(doutp, 0, 1).astype(f32)

    out_shape = [
        jax.ShapeDtypeStruct((T, B, 4 * h_dim), f32),
        jax.ShapeDtypeStruct((h_dim, 4 * h_dim), f32),
    ]
    if nb == 1:
        rev_idx = lambda s: (T - 1 - s, 0, 0)
        prev_idx = lambda s: (jnp.maximum(T - 2 - s, 0), 0, 0)
        dgates, dwh = pl.pallas_call(
            _lstm_bwd_kernel,
            out_shape=out_shape,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, B, 4 * h_dim), rev_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((T, B), lambda s: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((h_dim, 4 * h_dim), lambda s: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B, h_dim), prev_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B, h_dim), prev_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B, h_dim), rev_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((B, h_dim), lambda s: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B, h_dim), lambda s: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, B, 4 * h_dim), rev_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((h_dim, 4 * h_dim), lambda s: (0, 0), memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[pltpu.VMEM((2, B, h_dim), f32)],
            interpret=interpret,
        )(
            gates_all, mask_t, params["w_h"].astype(f32), h_seq, c_seq,
            dout_t, dh_last.astype(f32), dc_last.astype(f32),
        )
    else:
        rev_idx = lambda b, s: (T - 1 - s, b, 0)
        prev_idx = lambda b, s: (jnp.maximum(T - 2 - s, 0), b, 0)
        dgates, dwh = pl.pallas_call(
            partial(_lstm_bwd_kernel, t_axis=1),
            out_shape=out_shape,
            grid=(nb, T),
            in_specs=[
                pl.BlockSpec((1, C, 4 * h_dim), rev_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((T, C), lambda b, s: (0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec((h_dim, 4 * h_dim), lambda b, s: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C, h_dim), prev_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C, h_dim), prev_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C, h_dim), rev_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((C, h_dim), lambda b, s: (b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((C, h_dim), lambda b, s: (b, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, C, 4 * h_dim), rev_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((h_dim, 4 * h_dim), lambda b, s: (0, 0), memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[pltpu.VMEM((2, C, h_dim), f32)],
            interpret=interpret,
        )(
            gates_all, mask_t, params["w_h"].astype(f32), h_seq, c_seq,
            dout_t, dh_last.astype(f32), dc_last.astype(f32),
        )

    # Outside GEMMs: dgates → (dx, dW_x, db).
    dgates_b = jnp.swapaxes(dgates, 0, 1)                       # [B, T, 4h]
    dxp = dgates_b @ params["w_x"].T
    dx = jnp.flip(dxp, axis=1) if reverse else dxp
    d_wx = jnp.einsum("bti,btg->ig", xp.astype(f32), dgates_b)
    d_b = dgates.sum(axis=(0, 1))
    d_params = {
        "w_x": d_wx.astype(params["w_x"].dtype),
        "w_h": dwh.astype(params["w_h"].dtype),
        "b": d_b.astype(params["b"].dtype),
    }
    return d_params, dx.astype(x.dtype), None


lstm_pallas_trainable.defvjp(_trainable_fwd, _trainable_bwd)


def bilstm_pallas_trainable(
    params: dict, x: jax.Array, mask: jax.Array, interpret: bool | None = None
) -> tuple[jax.Array, tuple[jax.Array, jax.Array]]:
    """Bidirectional trainable wrapper matching ``ops.lstm.bilstm_apply``.

    Same row-chunking/fallback policy as ``bilstm_pallas`` with a 2×
    VMEM factor: the BPTT backward kernel additionally holds dgates
    blocks and the dW_h accumulator in VMEM."""
    chunk = 0 if interpret else _best_row_chunk(params, x, scale=2)
    if chunk is None:
        from mmbidaf_tpu.ops.lstm import bilstm_apply

        return bilstm_apply(params, x, mask)
    out_f, (h_f, c_f) = lstm_pallas_trainable(params["fwd"], x, mask, False, interpret, chunk)
    out_b, (h_b, c_b) = lstm_pallas_trainable(params["bwd"], x, mask, True, interpret, chunk)
    out = jnp.concatenate([out_f, out_b], axis=-1)
    return out, (
        jnp.concatenate([h_f, h_b], axis=-1),
        jnp.concatenate([c_f, c_b], axis=-1),
    )
