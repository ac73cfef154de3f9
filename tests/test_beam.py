"""Beam-search pointer decode properties (models/decoder.py).

The torch oracle has no beam search (the reference decodes greedy/top-k),
so beam is verified against its own mathematical contract:
  1. beam_size=1 == greedy decode exactly;
  2. the returned score is self-consistent with re-scoring the sequence
     step by step, and >= the greedy sequence's total score;
  3. with a beam wide enough to cover every branch, beam == exhaustive
     search over all pick sequences.
"""

import itertools

import numpy as np

import jax
import jax.numpy as jnp

from mmbidaf_tpu.models.decoder import (
    decoder_apply,
    decoder_beam_search,
    decoder_init,
)
from mmbidaf_tpu.ops.lstm import lstm_cell
from mmbidaf_tpu.ops.masked import mask_logits


def _setup(rng, B=3, T_s=5, d=8):
    params = decoder_init(jax.random.key(2), d, d)
    M = jnp.asarray(rng.standard_normal((B, T_s, d)).astype(np.float32))
    lengths = np.array([T_s, 3, 4])[:B]
    mask = jnp.asarray((np.arange(T_s)[None] < lengths[:, None]).astype(np.float32))
    return params, M, mask


def _seq_score(params, M_b, mask_b, picks, mask_selected=True):
    """Host-side re-score of one example's pick sequence (ground truth)."""
    d = M_b.shape[-1]
    h = c = jnp.zeros((1, d), jnp.float32)
    inp = params["start"][None, :]
    selected = jnp.zeros((1, M_b.shape[0]), jnp.float32)
    total = 0.0
    for p in picks:
        h, c = lstm_cell(inp @ params["lstm"]["w_x"] + params["lstm"]["b"], h, c,
                         params["lstm"]["w_h"])
        att = jnp.tanh(M_b[None] @ params["w_m"] + (h @ params["w_d"])[:, None, :]) @ params["v"]
        avail = mask_b[None] * (1.0 - selected) if mask_selected else mask_b[None]
        log_p = jax.nn.log_softmax(mask_logits(att, avail), axis=-1)
        total += float(log_p[0, p])
        selected = selected.at[0, p].set(1.0)
        inp = M_b[p][None]
    return total


def test_beam_size_one_equals_greedy(rng):
    params, M, mask = _setup(rng)
    _, picks_g = decoder_apply(params, M, mask, num_steps=3, teacher_forcing=False)
    _, picks_b = decoder_beam_search(params, M, mask, num_steps=3, beam_size=1)
    np.testing.assert_array_equal(np.asarray(picks_g), np.asarray(picks_b))


def test_beam_score_consistent_and_beats_greedy(rng):
    params, M, mask = _setup(rng)
    K = 3
    scores, picks = decoder_beam_search(params, M, mask, num_steps=K, beam_size=4)
    lp_g, picks_g = decoder_apply(params, M, mask, num_steps=K, teacher_forcing=False)
    lp_g = np.asarray(lp_g)
    for b in range(M.shape[0]):
        rescore = _seq_score(params, M[b], mask[b], np.asarray(picks[b]))
        np.testing.assert_allclose(float(scores[b]), rescore, rtol=1e-4, atol=1e-4)
        greedy_total = _seq_score(params, M[b], mask[b], np.asarray(picks_g[b]))
        assert float(scores[b]) >= greedy_total - 1e-5


def test_wide_beam_equals_exhaustive(rng):
    params, M, mask = _setup(rng, B=2, T_s=4)
    K = 2
    T_s = 4
    scores, picks = decoder_beam_search(
        params, M, mask, num_steps=K, beam_size=T_s * T_s
    )
    for b in range(2):
        n_valid = int(np.asarray(mask[b]).sum())
        best = -np.inf
        best_seq = None
        for seq in itertools.product(range(n_valid), repeat=K):
            if len(set(seq)) < K:  # mask_selected forbids repeats
                continue
            s = _seq_score(params, M[b], mask[b], list(seq))
            if s > best:
                best, best_seq = s, seq
        np.testing.assert_allclose(float(scores[b]), best, rtol=1e-4, atol=1e-4)
        assert tuple(np.asarray(picks[b])) == best_seq
