"""Sentence-pointer LSTM decoder (SURVEY.md §3.1 "Pointer decoder", §8 R4).

Design (the exact reference decoder internals are [K-med]; these choices are
documented here and mirrored bit-for-bit by the torch oracle so the parity
contract still holds):

- LSTM decoder with hidden size 2h; its input at step k is the fused sentence
  representation ``M[b, idx_{k-1}]`` of the previously selected sentence
  (a learned ``start`` vector at k=0); initial state zeros.
- Pointer scores via additive (Bahdanau) attention:
  ``e_k = v · tanh(M W_m + h_k W_d)`` → logits over T_s.
- Already-selected sentences are masked out when
  ``mask_selected=True`` (config flag, SURVEY §8 R4).
- Teacher forcing (train) vs argmax feedback (infer) is a *static* switch on
  one ``lax.scan`` — no Python control flow inside jit.

Returns per-step log-probabilities ``[B, K, T_s]`` (log-softmax, so NLL is a
gather) and the argmax selections ``[B, K]``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from mmbidaf_tpu.ops.lstm import lstm_cell, lstm_init
from mmbidaf_tpu.ops.masked import mask_logits


def decoder_init(key: jax.Array, m_dim: int, attn_dim: int, dtype=jnp.float32) -> dict:
    """``m_dim`` = fused sentence rep size (decoder hidden = m_dim)."""
    k_lstm, k_m, k_d, k_v, k_s = jax.random.split(key, 5)
    bound_m = 1.0 / jnp.sqrt(m_dim)
    bound_a = 1.0 / jnp.sqrt(attn_dim)
    return {
        "lstm": lstm_init(k_lstm, m_dim, m_dim, dtype),
        "w_m": jax.random.uniform(k_m, (m_dim, attn_dim), dtype, -bound_m, bound_m),
        "w_d": jax.random.uniform(k_d, (m_dim, attn_dim), dtype, -bound_m, bound_m),
        "v": jax.random.uniform(k_v, (attn_dim,), dtype, -bound_a, bound_a),
        "start": jax.random.uniform(k_s, (m_dim,), dtype, -bound_m, bound_m),
    }


@partial(
    jax.jit,
    static_argnames=("num_steps", "teacher_forcing", "mask_selected", "mode", "topk"),
)
def decoder_apply(
    params: dict,
    M: jax.Array,
    sent_mask: jax.Array,
    targets: jax.Array | None = None,
    num_steps: int = 4,
    teacher_forcing: bool = False,
    mask_selected: bool = True,
    mode: str = "greedy",
    topk: int = 4,
    rng: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Decode ``num_steps`` sentence pointers over fused reps ``M [B,T_s,d]``.

    ``targets [B, K]`` (gold sentence indices) must be given when
    ``teacher_forcing=True``. ``mode='greedy'`` takes the argmax;
    ``mode='topk'`` samples from the renormalized top-``topk`` sentences
    (the reference's greedy/top-k pointer decode — rng required).
    Returns ``(log_probs [B,K,T_s], picks [B,K])``.
    """
    if mode not in ("greedy", "topk"):
        raise ValueError(f"unknown decode mode {mode!r}")
    if mode == "topk" and rng is None:
        raise ValueError("topk decoding needs an rng key")
    B, T_s, d = M.shape
    dtype = M.dtype
    sent_mask = sent_mask.astype(dtype)

    # Hoist the (large) key projection out of the scan: one GEMM over all
    # sentences, reused every decode step.
    M_keys = M @ params["w_m"]  # [B, T_s, a]
    step_rngs = (
        jax.random.split(rng, num_steps) if rng is not None
        else jnp.zeros((num_steps, 2), jnp.uint32)
    )

    def step(carry, inputs):
        k, step_rng = inputs
        h, c, inp, selected = carry
        h, c = lstm_cell(
            inp @ params["lstm"]["w_x"] + params["lstm"]["b"], h, c, params["lstm"]["w_h"]
        )
        scores = jnp.tanh(M_keys + (h @ params["w_d"])[:, None, :]) @ params["v"]
        avail = sent_mask * (1.0 - selected) if mask_selected else sent_mask
        log_p = jax.nn.log_softmax(mask_logits(scores, avail), axis=-1)
        if mode == "topk":
            kth = jnp.sort(log_p, axis=-1)[:, -topk][:, None]
            trunc = jnp.where(log_p >= kth, log_p, -jnp.inf)
            pick = jax.random.categorical(step_rng, trunc, axis=-1)
        else:
            pick = jnp.argmax(log_p, axis=-1)  # [B]
        feed_idx = targets[:, k] if teacher_forcing else pick
        inp_next = jnp.take_along_axis(M, feed_idx[:, None, None], axis=1)[:, 0, :]
        selected = selected.at[jnp.arange(B), feed_idx].set(1.0) if mask_selected else selected
        return (h, c, inp_next, selected), (log_p, pick)

    init = (
        jnp.zeros((B, d), dtype),
        jnp.zeros((B, d), dtype),
        jnp.broadcast_to(params["start"], (B, d)),
        jnp.zeros((B, T_s), dtype),
    )
    _, (log_probs, picks) = jax.lax.scan(
        step, init, (jnp.arange(num_steps), step_rngs)
    )
    return jnp.swapaxes(log_probs, 0, 1), jnp.swapaxes(picks, 0, 1)


@partial(jax.jit, static_argnames=("num_steps", "beam_size", "mask_selected"))
def decoder_beam_search(
    params: dict,
    M: jax.Array,
    sent_mask: jax.Array,
    num_steps: int = 4,
    beam_size: int = 4,
    mask_selected: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Beam-search pointer decode (beyond the reference's greedy/top-k).

    Beams ride the batch axis (``[B·Bm, ...]`` states); each step scores
    all ``Bm·T_s`` continuations, keeps the global top ``Bm``, and reorders
    the LSTM state / selected-mask / pick history by parent beam. Step 0
    seeds only beam 0 so identical initial beams don't collapse the search.

    Returns ``(seq_log_prob [B], picks [B, num_steps])`` for the best beam.
    """
    B, T_s, d = M.shape
    Bm = beam_size
    dtype = M.dtype
    sent_mask = sent_mask.astype(dtype)

    Mx = jnp.repeat(M, Bm, axis=0)                      # [B·Bm, T_s, d]
    M_keys = Mx @ params["w_m"]
    maskx = jnp.repeat(sent_mask, Bm, axis=0)           # [B·Bm, T_s]
    batch_ar = jnp.arange(B * Bm)

    def step(carry, k):
        h, c, inp, selected, scores, hist = carry
        h, c = lstm_cell(
            inp @ params["lstm"]["w_x"] + params["lstm"]["b"], h, c,
            params["lstm"]["w_h"],
        )
        att = jnp.tanh(M_keys + (h @ params["w_d"])[:, None, :]) @ params["v"]
        avail = maskx * (1.0 - selected) if mask_selected else maskx
        log_p = jax.nn.log_softmax(mask_logits(att, avail), axis=-1)  # [B·Bm, T_s]

        total = scores.reshape(B * Bm, 1) + log_p
        flat = total.reshape(B, Bm * T_s)
        new_scores, idx = jax.lax.top_k(flat, Bm)       # [B, Bm]
        parent = idx // T_s                              # beam index within B
        pick = idx % T_s                                 # sentence index

        # Reorder every per-beam state by parent beam.
        src = (jnp.arange(B)[:, None] * Bm + parent).reshape(-1)  # [B·Bm]
        h = h[src]
        c = c[src]
        selected = selected[src]
        hist = hist[src]
        pick_flat = pick.reshape(-1)
        hist = jax.lax.dynamic_update_slice_in_dim(
            hist, pick_flat[:, None], k, axis=1
        )
        if mask_selected:
            selected = selected.at[batch_ar, pick_flat].set(1.0)
        inp = Mx[batch_ar, pick_flat]
        return (h, c, inp, selected, new_scores, hist), None

    # Step-0 seed: only beam 0 is live.
    init_scores = jnp.where(
        jnp.arange(Bm)[None, :] == 0, 0.0, -jnp.inf
    ) * jnp.ones((B, 1))
    init = (
        jnp.zeros((B * Bm, d), dtype),
        jnp.zeros((B * Bm, d), dtype),
        jnp.broadcast_to(params["start"], (B * Bm, d)),
        jnp.zeros((B * Bm, T_s), dtype),
        init_scores.astype(jnp.float32),
        jnp.zeros((B * Bm, num_steps), jnp.int32),
    )
    (_, _, _, _, scores, hist), _ = jax.lax.scan(
        step, init, jnp.arange(num_steps)
    )
    best = jnp.argmax(scores, axis=1)                   # [B]
    hist = hist.reshape(B, Bm, num_steps)
    picks = jnp.take_along_axis(hist, best[:, None, None], axis=1)[:, 0, :]
    return jnp.take_along_axis(scores, best[:, None], axis=1)[:, 0], picks
