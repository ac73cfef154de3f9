"""Bidirectional LSTM as a ``jax.lax.scan`` with fused gates (TPU-native).

Replaces the reference's cuDNN `nn.LSTM` + ``pack_padded_sequence`` path
(SURVEY.md §3.2 row 1, §9 "PyTorch LSTM conventions"). Design:

- **One big input GEMM up front**: ``x @ W_x`` for *all* timesteps is hoisted
  out of the scan as a single ``[B*T, in] @ [in, 4h]`` matmul (ideal MXU
  work); the scan body only does the small recurrent ``h @ W_h`` GEMM plus
  fused pointwise gate math — this is the "fused LSTM cell" equivalent.
- **Gate order i, f, g, o** (input, forget, cell, output) — torch's layout —
  so checkpoint porting is a transpose + concat, no reordering.
- **pack_padded_sequence parity** (SURVEY §8 R1): outputs at padded positions
  are zeroed and the carried state freezes at each sequence's true last valid
  step. For the reverse direction we reverse the *padded* time axis: because
  the mask freezes the (0,0) initial state across leading pads, this is
  exactly equivalent to starting the reverse pass at position ``len-1``.

Params (per direction): ``w_x [in, 4h]``, ``w_h [h, 4h]``, ``b [4h]``
(torch's ``bias_ih + bias_hh`` summed).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def lstm_init(key: jax.Array, in_dim: int, hidden: int, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(hidden)  # torch nn.LSTM default init
    return {
        "w_x": jax.random.uniform(k1, (in_dim, 4 * hidden), dtype, -bound, bound),
        "w_h": jax.random.uniform(k2, (hidden, 4 * hidden), dtype, -bound, bound),
        "b": jnp.zeros((4 * hidden,), dtype),
    }


def bilstm_init(key: jax.Array, in_dim: int, hidden: int, dtype=jnp.float32) -> dict:
    kf, kb = jax.random.split(key)
    return {
        "fwd": lstm_init(kf, in_dim, hidden, dtype),
        "bwd": lstm_init(kb, in_dim, hidden, dtype),
    }


def lstm_cell(
    gates: jax.Array, h: jax.Array, c: jax.Array, w_h: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """One step given precomputed input gates ``x_t @ w_x + b``. i,f,g,o order."""
    z = gates + h @ w_h
    i, f, g, o = jnp.split(z, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


@partial(jax.jit, static_argnames=("reverse", "unroll"))
def lstm_scan(
    params: dict,
    x: jax.Array,
    mask: jax.Array,
    reverse: bool = False,
    unroll: int = 1,
) -> tuple[jax.Array, tuple[jax.Array, jax.Array]]:
    """Run a unidirectional LSTM over ``x [B, T, D]`` with ``mask [B, T]``.

    Returns ``(outputs [B, T, h], (h_last [B, h], c_last [B, h]))`` where
    outputs are zero at masked positions and h_last/c_last are the states at
    each sequence's last *valid* step (pack_padded semantics).
    """
    B, T, _ = x.shape
    h_dim = params["w_h"].shape[0]
    dtype = x.dtype

    # Hoisted input projection: one big MXU GEMM for all timesteps.
    gates_all = x @ params["w_x"] + params["b"]  # [B, T, 4h]

    if reverse:
        gates_all = jnp.flip(gates_all, axis=1)
        mask_t = jnp.flip(mask, axis=1)
    else:
        mask_t = mask

    gates_all = jnp.swapaxes(gates_all, 0, 1)  # [T, B, 4h]
    mask_t = jnp.swapaxes(mask_t, 0, 1).astype(dtype)  # [T, B]

    def step(carry, inp):
        h, c = carry
        gates_t, m_t = inp
        h_new, c_new = lstm_cell(gates_t, h, c, params["w_h"])
        m = m_t[:, None]
        # Freeze state at padded steps; zero the emitted output there.
        h_carry = m * h_new + (1.0 - m) * h
        c_carry = m * c_new + (1.0 - m) * c
        return (h_carry, c_carry), h_new * m

    init = (
        jnp.zeros((B, h_dim), dtype),
        jnp.zeros((B, h_dim), dtype),
    )
    (h_last, c_last), out = jax.lax.scan(
        step, init, (gates_all, mask_t), unroll=unroll
    )
    out = jnp.swapaxes(out, 0, 1)  # [B, T, h]
    if reverse:
        out = jnp.flip(out, axis=1)
    return out, (h_last, c_last)


def bilstm_apply(
    params: dict, x: jax.Array, mask: jax.Array
) -> tuple[jax.Array, tuple[jax.Array, jax.Array]]:
    """Bidirectional LSTM. Returns ``(out [B, T, 2h], (h_last, c_last) [B, 2h])``.

    ``out[:, :, :h]`` is the forward direction, ``[:, :, h:]`` the reverse —
    torch ``nn.LSTM(bidirectional=True)`` output layout. A stacked params
    pytree (``{"layers": [...]}`` from :func:`stacked_bilstm_init`) runs the
    layers in sequence and returns the LAST layer's outputs/states, matching
    ``nn.LSTM(num_layers=L)``'s output and ``h_n[-2:]``.
    """
    if "layers" in params:
        return stacked_bilstm_apply(params, x, mask)
    out_f, (h_f, c_f) = lstm_scan(params["fwd"], x, mask, reverse=False)
    out_b, (h_b, c_b) = lstm_scan(params["bwd"], x, mask, reverse=True)
    out = jnp.concatenate([out_f, out_b], axis=-1)
    return out, (
        jnp.concatenate([h_f, h_b], axis=-1),
        jnp.concatenate([c_f, c_b], axis=-1),
    )


def stacked_bilstm_init(
    key: jax.Array, in_dim: int, hidden: int, num_layers: int = 1, dtype=jnp.float32
) -> dict:
    """Stacked BiLSTM params — ``nn.LSTM(num_layers=L, bidirectional=True)``.

    ``num_layers == 1`` returns the plain :func:`bilstm_init` pytree (same
    structure, same rng consumption — existing checkpoints/goldens are
    unaffected); deeper stacks return ``{"layers": [layer0, layer1, ...]}``
    where layer 0 takes ``in_dim`` and later layers take ``2*hidden`` (each
    direction of layer k feeds on the concatenated output of layer k-1,
    torch's stacking rule).
    """
    if num_layers < 1:
        raise ValueError(f"num_layers must be >= 1, got {num_layers}")
    if num_layers == 1:
        return bilstm_init(key, in_dim, hidden, dtype)
    keys = jax.random.split(key, num_layers)
    layers = [bilstm_init(keys[0], in_dim, hidden, dtype)]
    for k in keys[1:]:
        layers.append(bilstm_init(k, 2 * hidden, hidden, dtype))
    return {"layers": layers}


def stacked_bilstm_apply(
    params: dict,
    x: jax.Array,
    mask: jax.Array,
    bilstm_fn=None,
    drop_prob: float = 0.0,
    rng: jax.Array | None = None,
) -> tuple[jax.Array, tuple[jax.Array, jax.Array]]:
    """Run a (possibly stacked) BiLSTM params pytree over ``x``.

    Single-layer params are forwarded to ``bilstm_fn`` unchanged. Stacked
    params run layer-by-layer; with ``drop_prob > 0`` and an ``rng``,
    inter-layer dropout is applied to every layer's output except the last —
    ``nn.LSTM(dropout=p)`` semantics (the reference ``RNNEncoder`` passes its
    ``drop_prob`` there when ``num_layers > 1``). ``bilstm_fn`` lets the
    caller substitute the fused Pallas kernel per layer.
    """
    fn = bilstm_fn if bilstm_fn is not None else bilstm_apply
    if "layers" not in params:
        return fn(params, x, mask)
    layers = params["layers"]
    out, state = x, None
    for i, lp in enumerate(layers):
        out, state = fn(lp, x, mask)
        x = out
        if drop_prob > 0.0 and rng is not None and i < len(layers) - 1:
            rng, sub = jax.random.split(rng)
            keep = 1.0 - drop_prob
            x = x * jax.random.bernoulli(sub, keep, x.shape) / keep
    return out, state


def rnn_encoder_init(
    key: jax.Array, in_dim: int, hidden: int, dtype=jnp.float32, num_layers: int = 1
) -> dict:
    """`RNNEncoder` equivalent (SURVEY §3.1): ``num_layers``-deep BiLSTM, out dim 2h."""
    return stacked_bilstm_init(key, in_dim, hidden, num_layers, dtype)


def rnn_encoder_apply(
    params: dict,
    x: jax.Array,
    mask: jax.Array,
    drop_prob: float = 0.0,
    rng: jax.Array | None = None,
) -> jax.Array:
    """BiLSTM encoder with output dropout (matches reference RNNEncoder).

    For stacked params the same ``drop_prob`` also applies between layers
    (the reference wires one flag to both ``nn.LSTM(dropout=...)`` and the
    output ``F.dropout``)."""
    r_stack = r_out = None
    if rng is not None:
        if "layers" in params:
            r_stack, r_out = jax.random.split(rng)
        else:
            # Single-layer params use the incoming rng for output dropout
            # unsplit, preserving bit-exact dropout streams of seeded runs
            # from before stacked-encoder support (ADVICE r3).
            r_out = rng
    out, _ = stacked_bilstm_apply(params, x, mask, drop_prob=drop_prob, rng=r_stack)
    if drop_prob > 0.0 and rng is not None:
        keep = 1.0 - drop_prob
        out = out * jax.random.bernoulli(r_out, keep, out.shape) / keep
    return out
