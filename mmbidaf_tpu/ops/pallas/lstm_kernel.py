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


def _lstm_kernel(gates_ref, mask_ref, wh_ref, out_ref, hlast_ref, clast_ref, state):
    t = pl.program_id(0)
    T = pl.num_programs(0)

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


@partial(jax.jit, static_argnames=("reverse", "interpret"))
def lstm_pallas(
    params: dict,
    x: jax.Array,
    mask: jax.Array,
    reverse: bool = False,
    interpret: bool | None = None,
) -> tuple[jax.Array, tuple[jax.Array, jax.Array]]:
    """Drop-in replacement for ``lstm_scan`` (same outputs/semantics)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, _ = x.shape
    h_dim = params["w_h"].shape[0]
    f32 = jnp.float32

    gates_all = (x @ params["w_x"] + params["b"]).astype(f32)  # [B, T, 4h]
    gates_all = jnp.swapaxes(gates_all, 0, 1)                  # [T, B, 4h]
    mask_t = jnp.swapaxes(mask, 0, 1).astype(f32)              # [T, B]

    if reverse:
        # Kernel step t reads gates[T-1-t] and writes out[T-1-t] via the
        # index maps (no data movement); the mask is indexed by kernel step
        # directly, so it must be flipped to follow the gates stream.
        g_idx = lambda t: (T - 1 - t, 0, 0)
        mask_for_kernel = jnp.flip(mask_t, axis=0)
    else:
        g_idx = lambda t: (t, 0, 0)
        mask_for_kernel = mask_t
    o_idx = g_idx

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
            pl.BlockSpec((1, B, h_dim), o_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, h_dim), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, h_dim), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((2, B, h_dim), f32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * T * B * h_dim * 4 * h_dim,
            bytes_accessed=4 * T * B * (4 * h_dim + h_dim) + 4 * h_dim * 4 * h_dim,
            transcendentals=5 * T * B * h_dim,
        ),
    )(gates_all, mask_for_kernel, params["w_h"].astype(f32))
    return jnp.swapaxes(out, 0, 1), (h_last, c_last)


def bilstm_pallas(
    params: dict, x: jax.Array, mask: jax.Array, interpret: bool | None = None
) -> tuple[jax.Array, tuple[jax.Array, jax.Array]]:
    """Bidirectional wrapper matching ``ops.lstm.bilstm_apply``."""
    out_f, (h_f, c_f) = lstm_pallas(params["fwd"], x, mask, reverse=False, interpret=interpret)
    out_b, (h_b, c_b) = lstm_pallas(params["bwd"], x, mask, reverse=True, interpret=interpret)
    out = jnp.concatenate([out_f, out_b], axis=-1)
    return out, (
        jnp.concatenate([h_f, h_b], axis=-1),
        jnp.concatenate([c_f, c_b], axis=-1),
    )
