"""Block-level numerical parity vs the torch oracle (SURVEY.md §5 item 1).

Each test instantiates the torch reference block, ports its weights through
``mmbidaf_tpu.interop.torch_port``, and asserts allclose on random inputs
including ragged masks. Odd (non-128-aligned) sizes are used on purpose to
stress masking and shape handling.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mmbidaf_tpu.ops import (
    bidaf_apply,
    bilstm_apply,
    highway_apply,
    masked_softmax,
)
from mmbidaf_tpu.ops.lstm import lstm_scan
from mmbidaf_tpu.interop import torch_port
from tests.oracles import torch_model as oracle

ATOL = 2e-5


def _sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _ragged_mask(rng, B, T, min_len=1):
    lengths = rng.integers(min_len, T + 1, size=B)
    lengths[0] = T  # at least one full-length row
    mask = (np.arange(T)[None, :] < lengths[:, None]).astype(np.float32)
    return mask, lengths


def test_masked_softmax_matches_torch(rng):
    x = rng.standard_normal((3, 5, 7)).astype(np.float32)
    mask, _ = _ragged_mask(rng, 3, 7)
    ours = masked_softmax(jnp.asarray(x), jnp.asarray(mask)[:, None, :], axis=2)
    theirs = oracle.masked_softmax(
        torch.from_numpy(x), torch.from_numpy(mask).view(3, 1, 7), dim=2
    )
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=ATOL)
    # log-softmax variant
    ours_log = masked_softmax(
        jnp.asarray(x), jnp.asarray(mask)[:, None, :], axis=2, log_softmax=True
    )
    theirs_log = oracle.masked_softmax(
        torch.from_numpy(x), torch.from_numpy(mask).view(3, 1, 7), dim=2, log_softmax=True
    )
    # only compare at valid positions (masked positions are -inf-ish)
    valid = mask[:, None, :] > 0
    np.testing.assert_allclose(
        np.asarray(ours_log)[np.broadcast_to(valid, ours_log.shape)],
        theirs_log.numpy()[np.broadcast_to(valid, ours_log.shape)],
        atol=ATOL,
    )


def test_highway_matches_torch(rng):
    torch.manual_seed(0)
    dim = 13
    thw = oracle.HighwayEncoder(2, dim).eval()
    params = torch_port.port_highway(_sd(thw), "", num_layers=2)
    x = rng.standard_normal((4, 6, dim)).astype(np.float32)
    ours = highway_apply(params, jnp.asarray(x))
    theirs = thw(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(ours), theirs.detach().numpy(), atol=ATOL)


def test_highway_port_prefix(rng):
    """port_highway with a real module prefix (as inside a parent model)."""
    torch.manual_seed(1)
    dim = 8

    class Parent(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.hwy = oracle.HighwayEncoder(2, dim)

    p = Parent().eval()
    params = torch_port.port_highway(_sd(p), "hwy", num_layers=2)
    x = rng.standard_normal((2, 3, dim)).astype(np.float32)
    ours = highway_apply(params, jnp.asarray(x))
    theirs = p.hwy(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(ours), theirs.detach().numpy(), atol=ATOL)


@pytest.mark.parametrize("in_dim,hidden,B,T", [(11, 7, 5, 9), (16, 16, 3, 12)])
def test_bilstm_matches_torch_ragged(rng, in_dim, hidden, B, T):
    """BiLSTM vs torch nn.LSTM + pack_padded_sequence (SURVEY §8 risk R1)."""
    torch.manual_seed(2)
    tenc = oracle.RNNEncoder(in_dim, hidden).eval()
    params = torch_port.port_bilstm(_sd(tenc), "rnn")

    x = rng.standard_normal((B, T, in_dim)).astype(np.float32)
    mask, lengths = _ragged_mask(rng, B, T)

    out, (h_n, c_n) = bilstm_apply(params, jnp.asarray(x), jnp.asarray(mask))
    tout, (th_n, tc_n) = tenc(torch.from_numpy(x), torch.from_numpy(lengths))

    np.testing.assert_allclose(np.asarray(out), tout.detach().numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(h_n), th_n.detach().numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(c_n), tc_n.detach().numpy(), atol=ATOL)


def test_lstm_scan_unidirectional_full_length(rng):
    """Sanity: our fwd scan vs torch unidirectional LSTM, full-length."""
    torch.manual_seed(3)
    in_dim, hidden, B, T = 6, 5, 4, 8
    tl = torch.nn.LSTM(in_dim, hidden, batch_first=True)
    sd = {f"rnn.{k}": v.detach().numpy() for k, v in tl.state_dict().items()}
    params = torch_port.port_lstm_direction(sd, "rnn")
    x = rng.standard_normal((B, T, in_dim)).astype(np.float32)
    mask = np.ones((B, T), np.float32)
    out, (h_n, c_n) = lstm_scan(params, jnp.asarray(x), jnp.asarray(mask))
    tout, (th, tc) = tl(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(out), tout.detach().numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(h_n), th[0].detach().numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(c_n), tc[0].detach().numpy(), atol=ATOL)


@pytest.mark.parametrize("dim,Tc,Tq", [(10, 7, 5), (16, 9, 9)])
def test_bidaf_attention_matches_torch(rng, dim, Tc, Tq):
    torch.manual_seed(4)
    B = 3
    tatt = oracle.BiDAFAttention(dim).eval()
    params = torch_port.port_bidaf_attention(_sd(tatt), "")
    c = rng.standard_normal((B, Tc, dim)).astype(np.float32)
    q = rng.standard_normal((B, Tq, dim)).astype(np.float32)
    c_mask, _ = _ragged_mask(rng, B, Tc)
    q_mask, _ = _ragged_mask(rng, B, Tq)

    ours = bidaf_apply(
        params, jnp.asarray(c), jnp.asarray(q), jnp.asarray(c_mask), jnp.asarray(q_mask)
    )
    theirs = tatt(
        torch.from_numpy(c),
        torch.from_numpy(q),
        torch.from_numpy(c_mask),
        torch.from_numpy(q_mask),
    )
    np.testing.assert_allclose(np.asarray(ours), theirs.detach().numpy(), atol=ATOL)


def test_bidaf_output_masked_rows_are_finite(rng):
    """Masked context rows must not produce NaN/Inf (downstream safety)."""
    dim, B, Tc, Tq = 8, 2, 5, 4
    params = {
        "w_c": jnp.ones((dim,)) * 0.1,
        "w_q": jnp.ones((dim,)) * 0.1,
        "w_cq": jnp.ones((dim,)) * 0.1,
        "bias": jnp.zeros(()),
    }
    c = jnp.asarray(rng.standard_normal((B, Tc, dim)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((B, Tq, dim)).astype(np.float32))
    c_mask = jnp.asarray(np.array([[1, 1, 0, 0, 0], [1, 1, 1, 1, 1]], np.float32))
    q_mask = jnp.asarray(np.array([[1, 1, 1, 0], [1, 1, 1, 1]], np.float32))
    out = bidaf_apply(params, c, q, c_mask, q_mask)
    assert bool(jnp.all(jnp.isfinite(out)))
