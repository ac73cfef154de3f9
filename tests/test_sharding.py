"""Multi-device correctness on the faked v5e-8 CPU mesh (SURVEY.md §5 item 3):
sharded batch-32 inference equals single-device inference; sharded train step
runs and reduces gradients.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmbidaf_tpu.config import tiny_test_config
from mmbidaf_tpu.data.synthetic import random_word_vectors, synthetic_batch
from mmbidaf_tpu.models.mmbidaf import mmbidaf_decode, mmbidaf_init
from mmbidaf_tpu.parallel import (
    batch_sharding,
    make_mesh,
    shard_batch,
    shard_params,
)
from mmbidaf_tpu.train.loop import init_train_state, make_train_step
from mmbidaf_tpu.config import MeshConfig


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config()
    rng = np.random.default_rng(11)
    wv = random_word_vectors(rng, cfg.data.vocab_size, cfg.model.emb_dim)
    params = mmbidaf_init(jax.random.key(0), cfg, jnp.asarray(wv))
    batch = synthetic_batch(rng, cfg, batch_size=32)
    return cfg, params, batch


def test_sharded_inference_equals_single_device(setup, eight_device_mesh):
    cfg, params, batch = setup
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}

    # Single-device ground truth.
    log_p_1, picks_1 = jax.jit(
        lambda p, b: mmbidaf_decode(p, b, cfg)
    )(params, jbatch)

    # 8-way batch-sharded.
    mesh = eight_device_mesh
    sparams = shard_params(params, mesh)
    sbatch = shard_batch(jbatch, mesh)
    log_p_8, picks_8 = jax.jit(
        lambda p, b: mmbidaf_decode(p, b, cfg),
        out_shardings=batch_sharding(mesh),
    )(sparams, sbatch)

    np.testing.assert_array_equal(np.asarray(picks_1), np.asarray(picks_8))
    np.testing.assert_allclose(
        np.asarray(log_p_1), np.asarray(log_p_8), atol=1e-5
    )


def test_sharded_train_step_runs(setup, eight_device_mesh):
    cfg, params, batch = setup
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, optimizer="adam", lr=1e-3)
    )
    mesh = eight_device_mesh
    state = init_train_state(jax.random.key(1), shard_params(params, mesh), cfg)
    sbatch = shard_batch({k: jnp.asarray(v) for k, v in batch.items()}, mesh)
    train_step = make_train_step(cfg)
    state, metrics = train_step(state, sbatch)
    assert np.isfinite(float(metrics["loss"]))
    # Params remain replicated after the update (grads were psum-reduced).
    fuse_sh = state.params["fuse_w"].sharding
    assert fuse_sh.is_fully_replicated


def test_ring_bidaf_matches_local(eight_device_mesh):
    """Ring-scheduled BiDAF over the 8-device mesh == local tiled kernel ==
    jnp reference (SURVEY §3.3 ring row; ragged masks, padded seq axes)."""
    from mmbidaf_tpu.ops.bidaf import bidaf_apply, bidaf_init
    from mmbidaf_tpu.ops.pallas.bidaf_tiled_kernel import bidaf_attention_tiled
    from mmbidaf_tpu.parallel.ring_attention import make_ring_bidaf

    rng = np.random.default_rng(17)
    B, T_c, T_q, D = 2, 32, 21, 16  # T_q=21 forces ring padding (21 % 8 != 0)
    params = bidaf_init(jax.random.key(5), D)
    c = jnp.asarray(rng.standard_normal((B, T_c, D)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((B, T_q, D)).astype(np.float32))
    lengths_c = np.array([32, 17])
    lengths_q = np.array([21, 9])
    c_mask = jnp.asarray((np.arange(T_c)[None] < lengths_c[:, None]).astype(np.float32))
    q_mask = jnp.asarray((np.arange(T_q)[None] < lengths_q[:, None]).astype(np.float32))

    ref = bidaf_apply(params, c, q, c_mask, q_mask)
    tiled = bidaf_attention_tiled(params, c, q, c_mask, q_mask, tc_blk=8, tq_blk=8,
                                  interpret=True)
    ring = make_ring_bidaf(eight_device_mesh)(params, c, q, c_mask, q_mask)

    np.testing.assert_allclose(np.asarray(tiled), np.asarray(ref), atol=3e-5)
    np.testing.assert_allclose(np.asarray(ring), np.asarray(ref), atol=3e-5)


def test_two_level_dcn_mesh_factory():
    mesh = make_mesh(MeshConfig(num_dcn=2, num_data=4))
    assert mesh.axis_names == ("dcn", "data")
    assert mesh.devices.shape == (2, 4)
