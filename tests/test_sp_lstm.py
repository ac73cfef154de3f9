"""Pipelined sequence-parallel BiLSTM == the local masked scan
(parallel/sp_lstm.py vs ops/lstm.py, 8-device CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmbidaf_tpu.ops.lstm import bilstm_apply, bilstm_init
from mmbidaf_tpu.parallel.sp_lstm import make_sp_bilstm


def _ragged_mask(rng, B, T):
    lens = rng.integers(1, T + 1, size=B)
    lens[0] = T          # one full sequence
    lens[1] = 3          # one ending inside the first chunk
    return (np.arange(T)[None, :] < lens[:, None]).astype(np.float32)


@pytest.mark.parametrize("microbatches", [None, 2, 8])
def test_sp_bilstm_matches_local(rng, eight_device_mesh, microbatches):
    B, T, Din, h = 8, 48, 10, 12   # T = 48 → 6 steps per device chunk
    params = bilstm_init(jax.random.key(0), Din, h)
    x = jnp.asarray(rng.standard_normal((B, T, Din)).astype(np.float32))
    mask = jnp.asarray(_ragged_mask(rng, B, T))

    ref, _ = bilstm_apply(params, x, mask)
    sp = make_sp_bilstm(eight_device_mesh, microbatches=microbatches)
    out = sp(params, x, mask)

    assert out.shape == (B, T, 2 * h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_sp_bilstm_output_stays_time_sharded(rng, eight_device_mesh):
    """The output shards over the time axis (ready for ring attention —
    no gather between the SP tower and an SP attention stage)."""
    B, T, Din, h = 4, 16, 6, 5
    params = bilstm_init(jax.random.key(1), Din, h)
    x = jnp.asarray(rng.standard_normal((B, T, Din)).astype(np.float32))
    mask = jnp.ones((B, T), jnp.float32)

    out = make_sp_bilstm(eight_device_mesh)(params, x, mask)
    spec = out.sharding.spec
    assert len(spec) >= 2 and spec[1] is not None, spec

    ref, _ = bilstm_apply(params, x, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_sp_bilstm_all_padding_rows(rng, eight_device_mesh):
    """A fully-masked row yields zero outputs (pack_padded semantics)."""
    B, T, Din, h = 2, 16, 4, 3
    params = bilstm_init(jax.random.key(2), Din, h)
    x = jnp.asarray(rng.standard_normal((B, T, Din)).astype(np.float32))
    mask = jnp.stack([jnp.ones((T,)), jnp.zeros((T,))]).astype(jnp.float32)

    out = make_sp_bilstm(eight_device_mesh)(params, x, mask)
    np.testing.assert_allclose(np.asarray(out[1]), 0.0, atol=1e-7)
    ref, _ = bilstm_apply(params, x, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
